"""Dedup operator guarantees that the oracle comparison can't see:
simhash parity with the r1 explode implementation (frozen semantics),
the pure-Python XXH64 used for golden generation, and the zero-shuffle
plan shape of the rewritten simhash."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import functions as F

from latex_ocr_spark.operators.dedup import _tokens, simhash64


def _simhash64_r1(docs, text_col="text", id_col="doc_id"):
    """The round-1 explode implementation, kept verbatim as the frozen
    semantic baseline for the zero-shuffle rewrite."""
    tok = docs.select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok"))
    h = tok.withColumn("h", F.xxhash64("tok"))
    bits = h.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"), F.col("h")
    ).withColumn(
        "vote", F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END")
    )
    votes = bits.groupBy("id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def test_simhash_parity_with_r1_impl(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    old = {r.id: r.simhash for r in _simhash64_r1(docs).collect()}
    new = {r.id: r.simhash for r in simhash64(docs).collect()}
    assert old == new
    assert len(new) == docs.count()


def test_simhash_zero_token_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "   "), (2, "")], "doc_id long, text string"
    )
    got = {r.id for r in simhash64(docs).collect()}
    assert got == {0}  # explode semantics: token-less docs emit nothing


def test_simhash_plan_has_no_exchange(spark, sf_small):
    # assert on an already-parallel input — the corpus-scale shape;
    # on a single test-scale split the amplification guard adds one
    # deliberate fan-out (covered by test_shingle_amplification_guard)
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    plan = simhash64(docs)._jdf.queryExecution().executedPlan().toString()
    # only the caller's own repartition; simhash itself adds nothing
    assert plan.count("Exchange") == 1  # scan -> (fan-out) -> filter -> project


def test_pyxxh64_matches_spark(spark):
    from tools.pyxxh64 import xxh64

    cases = [
        "", "a", "ab", "abc", "1234567", "12345678", "123456789",
        "0123456789abcdef0123456789abcde",     # 31 B: < one stripe
        "0123456789abcdef0123456789abcdef",    # 32 B: exactly one stripe
        "x" * 33, "y" * 100, "\\frac{1}{2}", "λ∑ unicode", "a b  c\td\n",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64(r.s.encode("utf-8")) == r.h, repr(r.s)


def test_duplicate_clusters_chain_and_cliques(spark):
    """Min-label propagation must close transitive chains (A≈B, B≈C,
    C≈D → one cluster), not just direct pairs — diameter > 1 forces
    multiple propagation rounds."""
    from latex_ocr_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),   # chain: diameter 4
            (10, 11), (10, 12), (11, 12),     # clique
            (20, 21),                         # simple pair
        ],
        "a_id long, b_id long",
    )
    got = {r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_lsh_bucket_cap_bounds_degenerate_keys(spark):
    """A monster bucket (identical boilerplate repeated) must not
    produce k^2 candidates when the cap is on — and the cap must not
    touch ordinary near-dup buckets."""
    from latex_ocr_spark.operators.dedup import lsh_candidate_pairs

    boiler = [(i, "common boilerplate page body repeated verbatim") for i in range(40)]
    pair = [(100, "rare unique zq1 wq1 vq1"), (101, "rare unique zq1 wq1 vq1")]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")

    uncapped = lsh_candidate_pairs(docs, ngram=1).count()
    assert uncapped >= (40 * 39) // 2  # the blowup is real

    capped = {
        (r.a_id, r.b_id)
        for r in lsh_candidate_pairs(docs, ngram=1, max_bucket_size=10).collect()
    }
    assert (100, 101) in capped          # ordinary bucket untouched
    assert all(a >= 100 for a, _ in capped)  # monster bucket dropped


def test_duplicate_clusters_long_chain_near_max_iter(spark):
    """A path-shaped component (worst case for min-label propagation:
    the min label travels ONE hop per round) sized near the default
    max_iter must still converge — proving the guard triggers on real
    non-convergence, not on realistic diameters.  Cost model: rounds =
    diameter + 1 confirming round, one shuffle each."""
    from latex_ocr_spark.operators.dedup import duplicate_clusters

    k = 22  # diameter 21 + 1 confirming round < max_iter=25
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, k)], "a_id long, b_id long"
    )
    got = {r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, k + 1)}


def test_duplicate_clusters_raises_on_non_convergence(spark):
    """When a component's diameter exceeds max_iter the operator must
    RAISE, never return a silently split component (a partial result
    keeps several 'canonical' copies of one duplicate group)."""
    import pytest

    from latex_ocr_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=3)


def test_decontaminate_drops_contaminated_and_keeps_rest(spark):
    """Cross-corpus decontamination: corpus docs near-duplicating an
    eval doc land in the report and are anti-joined out of the cleaned
    corpus; unrelated docs survive untouched."""
    from latex_ocr_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of eval 1
            (3, "one two three four five six seven eight"),
            (4, "unrelated tokens qq ww ee rr tt yy uu ii"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(-1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    report, cleaned = decontaminate(corpus, evalset, threshold=0.5, ngram=3)
    rep = {(r.corpus_id, r.eval_id): r.jaccard for r in report.collect()}
    assert rep[(1, -1)] == 1.0          # exact copy
    assert (2, -1) in rep               # near-dup caught
    kept = sorted(r.doc_id for r in cleaned.collect())
    assert kept == [3, 4]
    from latex_ocr_spark import cachepool

    cachepool.release()


def test_cross_candidates_broadcast_eval_side(spark):
    """Scale shape: the eval side must broadcast — the corpus-side
    keyed frame joins map-side, no shuffle on the corpus for the
    candidate step."""
    from latex_ocr_spark.operators.dedup import cross_lsh_candidates

    corpus = spark.range(200).selectExpr(
        "id AS doc_id",
        "concat('tok', id % 37, ' tok', (id+1) % 37, ' tok', (id+2) % 37, "
        "' tok', (id+3) % 37) AS text",
    )
    evalset = spark.range(2).selectExpr(
        "-(id + 1) AS doc_id",
        "concat('tok', id % 37, ' tok', (id+1) % 37, ' tok', (id+2) % 37, "
        "' tok', (id+3) % 37) AS text",
    )
    cand = cross_lsh_candidates(corpus, evalset, ngram=3)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {(r.a_id, r.b_id) for r in cand.collect()}
    assert (0, -1) in got and (1, -2) in got  # the planted copies collide


def test_decontaminate_is_idempotent(spark):
    """Decontaminating an already-clean corpus finds nothing — the
    fixpoint property a pipeline retry relies on."""
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
            (3, "unrelated tokens qq ww ee rr tt yy uu ii"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(-1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    report1, cleaned1 = decontaminate(corpus, evalset, threshold=0.5, ngram=3)
    assert report1.count() == 1 and cleaned1.count() == 2
    report2, cleaned2 = decontaminate(cleaned1, evalset, threshold=0.5, ngram=3)
    assert report2.count() == 0
    assert cleaned2.count() == 2
    cachepool.release()


def test_shingle_amplification_guard(spark):
    """The explode-heavy shingle stage must fan out an
    under-partitioned input (single parquet split → serial explode)
    and leave an already-parallel input's plan untouched."""
    from latex_ocr_spark.operators.dedup import _with_min_parallelism

    one = spark.range(100).coalesce(1).selectExpr("id AS doc_id", "'a b c' AS text")
    fanned = _with_min_parallelism(one)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism
    ).selectExpr("id AS doc_id", "'a b c' AS text")
    assert _with_min_parallelism(wide) is wide  # strict no-op


def test_star_clusters_match_propagation_on_mixed_topologies(spark):
    """large-star/small-star contraction must produce the identical
    (id, cluster_id) table as min-label propagation — two fixpoint
    algorithms, one answer — on chains, cliques, pairs, and a random
    pair soup."""
    import random

    from latex_ocr_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    fixed = [
        (1, 2), (2, 3), (3, 4), (4, 5),
        (10, 11), (10, 12), (11, 12),
        (20, 21),
    ]
    rng = random.Random(7)
    soup = [(rng.randrange(100, 160), rng.randrange(100, 160)) for _ in range(80)]
    soup = [(a, b) for a, b in soup if a != b]
    pairs = spark.createDataFrame(fixed + soup, "a_id long, b_id long")

    prop = {r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    star = {r.id: r.cluster_id for r in duplicate_clusters_star(pairs).collect()}
    assert star == prop


def test_star_clusters_bound_rounds_on_adversarial_chain(spark):
    """THE topology star contraction exists for: a 64-link chain
    (diameter 63) — min-label propagation would need 64 rounds and
    raises at its default 25-round cap; star contraction closes it
    within 10 alternating rounds."""
    import pytest

    from latex_ocr_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    k = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, k)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs)  # default max_iter=25 < diameter

    got = {
        r.id: r.cluster_id
        for r in duplicate_clusters_star(pairs, max_iter=10).collect()
    }
    assert got == {i: 1 for i in range(1, k + 1)}


def test_star_clusters_match_propagation_on_registry_pairs(spark, sf_small):
    """Oracle by transitivity: on the SAME pair input the driver's
    ``dedup_clusters`` query uses (planted-copy capped Jaccard at
    sf0.001), star contraction must equal min-label propagation — and
    propagation is driver-hash-green against the recursive-CTE oracle,
    so star inherits the oracle without spending a slot of the
    50-query driver window."""
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
        jaccard_pairs,
    )
    from latex_ocr_spark.plans.registry import _planted_docs

    pairs = jaccard_pairs(
        _planted_docs(spark, sf_small), threshold=0.3, ngram=1, max_df=50
    )
    prop = {r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    star = {r.id: r.cluster_id for r in duplicate_clusters_star(pairs).collect()}
    assert star == prop and star
    cachepool.release()


def test_star_clusters_keep_self_loop_singletons(spark):
    """Same-output contract edge case (round-5 review): a pairs frame
    containing a self-loop (a, a) yields the singleton cluster (a, a)
    from propagation — star contraction must emit it too."""
    from latex_ocr_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    pairs = spark.createDataFrame(
        [(7, 7), (1, 2)], "a_id long, b_id long"
    )
    prop = {r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    star = {r.id: r.cluster_id for r in duplicate_clusters_star(pairs).collect()}
    assert star == prop == {7: 7, 1: 1, 2: 1}


def test_fused_profile_kernel_parity_with_jvm_path(spark):
    """The r7 fused Arrow profile kernel (tokenize + shingle + md5
    MinHash family in one mapInArrow pass) must be bit-identical to the
    JVM projection path it replaces — including the Java-regex
    whitespace semantics (\\s is the ASCII six, so NBSP/\\x1c must NOT
    split), first-occurrence shingle order, empty/null/short-text
    drops, and the (id, [shingles,] sig_*, [n_shingles]) schema."""
    from latex_ocr_spark.operators.dedup import (
        doc_shingle_arrays,
        minhash_signatures,
    )

    rows = [
        ("a", "x y z"),  # NBSP is not Java \s
        ("b", "  leading and trailing  "),
        ("c", None),
        ("d", ""),
        ("e", "one two"),  # ngram=3 over 2 tokens -> dropped
        ("f", "tab\tsep\nnl\x0bvt\fff\rcr end pad"),
        ("g", "é café münchen töken four five"),
        ("h", "a b c a b c a b c"),  # duplicate shingles
        ("i", "x \x1c y \x1d z w q"),  # \x1c/\x1d not Java \s
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    for ngram, k, size, shingles in [(3, 8, True, True), (1, 4, True, False)]:
        fused = minhash_signatures(
            docs, k, "text", "doc_id", ngram,
            include_size=size, include_shingles=shingles,
        )
        arrs = doc_shingle_arrays(docs, "text", "doc_id", ngram)
        jvm = minhash_signatures(
            docs, k, "text", "doc_id", ngram, _arrs=arrs,
            include_size=size, include_shingles=shingles,
        )
        assert fused.columns == jvm.columns
        got = {r["id"]: tuple(r) for r in fused.collect()}
        want = {r["id"]: tuple(r) for r in jvm.collect()}
        assert got == want and got  # non-vacuous
