"""Deduplication operators for large-scale corpus hygiene.

Exact dedup is the reference's memo-cache / set-dedup idiom
(latex2png.py:137-143, extract_latex.py:74) generalized to tables; the
near-dup family (jaccard, MinHash+LSH, SimHash) is the standard
training-data stack, built Spark-first:

- hashes are md5 (identical in Spark and DuckDB → oracle-checkable);
- shingling/explode/groupBy stay JVM-side; no Python in any hot path;
- MinHash+LSH is the scale path: candidate generation is a band-key
  equi-join, never an O(n²) cross join.

Caching policy: frames feeding both sides of a self-join are
persisted (Spark recomputes a self-join's lineage per side) via
``cachepool.track`` — owned by the query boundary: the next query (or
an explicit ``cachepool.release()``) unpersists them, so a many-query
session (driver harness, bench.py, pytest) never accumulates stale
caches that evict later queries' working set (round-2 verdict #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from latex_ocr_spark import cachepool


def _tokens(col: str):
    """Whitespace tokens with empties removed (JVM-side)."""
    return F.filter(F.split(F.col(col), r"\s+"), lambda t: t != "")


def _drop_hot_keys(df: DataFrame, key_cols: list, cap: int) -> DataFrame:
    """Remove every row whose key occurs more than ``cap`` times —
    the shared guard behind both quadratic-blowup mitigations
    (jaccard max_df, LSH max_bucket_size).  The hot-key list is small
    by construction (keys above a count threshold) and broadcast; the
    anti-join is a cheap probe over the (cached) input partitions."""
    hot = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(*key_cols)
    )
    return df.join(F.broadcast(hot), key_cols, "left_anti")


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (text_hash, canonical_id, dup_count).

    Hash-groupBy with map-side partial aggregation; the canonical row
    is the minimum id (deterministic under any partitioning).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            # keep the id column's own type — casting string ids to
            # long would silently nullify every canonical_id
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _with_min_parallelism(df: DataFrame) -> DataFrame:
    """Amplification guard for explode-heavy stages: when the input has
    fewer partitions than the session has slots (a single small parquet
    split — common at test scale, impossible at corpus scale where the
    scan exposes thousands of splits), fan the rows out FIRST so the
    explode runs parallel instead of serializing on one core.  Cost:
    one shuffle of the raw (pre-amplification) rows, orders of
    magnitude below the serialized-explode alternative; a strict no-op
    (zero plan change) whenever the input is already parallel.

    Known cost of the probe itself (r7, measured): on a frame with an
    upstream exchange, ``df.rdd`` finalizes the adaptive plan, which
    executes the upstream shuffle stages as a throwaway job ('
    javaToPython' in the job list) — for the funnel's profile input
    that is one extra map pass through the exact-dedup aggregation per
    run.  A static skip was prototyped and REJECTED: "plan contains
    Join/Aggregate" does not imply parallel output (a broadcast
    semi-join's streamed side keeps the scan's possibly-single-split
    partitioning — exactly the case the guard exists for), and file
    counts cannot bound split counts under small-file packing.  The
    probe stays; its cost is one bounded extra pass, never quadratic.
    """
    if df.isStreaming:  # .rdd is undefined on streaming frames
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def _bind1(expr, fn):
    """Evaluate ``expr`` exactly once per row and hand it to ``fn`` as a
    lambda variable (a ``transform`` over a one-element array).

    The guard this exists for: a named intermediate column referenced
    several times downstream can be re-inlined by CollapseProject /
    filter pushdown, so an expensive expression (tokenize + shingle) is
    re-evaluated per reference — and an expression captured inside a
    higher-order lambda (``element_at(toks, i)``) is re-evaluated per
    ELEMENT access, turning an O(tokens) projection into O(tokens²)
    (measured: one 32-task shingle stage burned ~100 s/task at sf1.0).
    A lambda variable is bound once per row by construction; the
    optimizer cannot substitute through it."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def _shingle_expr(toks, ngram: int):
    """n-gram shingle array from a BOUND token-array (lambda variable or
    attribute — never a raw expression, see :func:`_bind1`)."""
    if ngram == 1:
        return toks
    return F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (ngram - 1), F.lit(0))),
        lambda _t, i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(ngram)]
        ),
    )


def doc_shingle_arrays(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    parallel_hint: bool = True,
) -> DataFrame:
    """(id, shingles) — the DISTINCT shingle set per document as one
    array column, computed entirely row-wise: no explode, no distinct
    exchange, no groupBy.  ``shingles`` may be NULL (null text) or
    empty (too few tokens); consumers that key on shingles filter
    ``size(shingles) > 0`` — the explode path drops such rows
    implicitly, so both representations agree document-for-document.

    This is the scale lever for the whole MinHash/LSH family (guide
    §2.3/§2.4 shuffle-fewer-bytes / remove-shuffles): signatures, sizes
    and exact-verify intersections are all per-document functions of
    this set, so none of them needs the exploded (id, shingle) relation
    or its corpus-wide exchanges."""
    if parallel_hint:
        docs = _with_min_parallelism(docs)
    sh = _bind1(_tokens(text_col), lambda t: F.array_distinct(_shingle_expr(t, ngram)))
    return docs.select(F.col(id_col).alias("id"), sh.alias("shingles"))


def doc_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    parallel_hint: bool = True,
) -> DataFrame:
    """Distinct (id, shingle) pairs; shingle = n consecutive tokens.

    Derived by exploding the per-document distinct set from
    :func:`doc_shingle_arrays`: dedup happens inside the row, so the
    corpus-wide ``distinct()`` exchange the r1-r6 implementation paid is
    gone — the plan is scan → project → generate with no shuffle.
    Pass ``parallel_hint=False`` for inputs KNOWN to be small (an
    eval/benchmark set): fanning a few hundred rows across every core
    is a wasted exchange, and the guard cannot tell small from
    under-split without an action."""
    arrs = doc_shingle_arrays(docs, text_col, id_col, ngram, parallel_hint)
    return arrs.select("id", F.explode("shingles").alias("shingle"))



def _jaccard_from_intersections(
    inter, sh, threshold: float, sh_b=None, sizes=None, sizes_b=None
):
    """(a_id, b_id, jaccard) from an intersection-count frame + the
    shingle frame(s): |A∩B| / (|A| + |B| - |A∩B|), rounded and gated.
    Shared by the exact self-join path, the LSH-verified path, and the
    cross-corpus decontamination path (``sh_b`` = the b-side shingle
    frame when a_id and b_id come from different tables) so the
    denominator arithmetic can never drift between them.

    ``sizes``/``sizes_b``: precomputed (id, n_shingles) frames.  The
    LSH paths pass the size column their signature aggregation already
    produced (one groupBy instead of two over the corpus shingles —
    each separate aggregation is a full corpus-wide exchange)."""
    if sizes is None:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    if sizes_b is None:
        sizes_b = (
            sizes
            if sh_b is None
            else sh_b.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
        )
    return (
        inter.join(
            sizes.withColumnRenamed("id", "a_id").withColumnRenamed("n_shingles", "a_n"),
            "a_id",
        )
        .join(
            sizes_b.withColumnRenamed("id", "b_id").withColumnRenamed("n_shingles", "b_n"),
            "b_id",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("a_n") + F.col("b_n") - F.col("n_common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    max_df: int | None = None,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a_id < b_id, jac ≥ threshold).

    Shingle-inverted-index self-join — the exact baseline the LSH path
    approximates.  At 100 TB you run :func:`lsh_candidate_pairs` first
    and this only on the candidates; standalone it is still shuffle-
    bounded by shingle frequency, not O(n²).

    ``max_df`` is the hot-shingle cap: shingles occurring in more than
    ``max_df`` documents are dropped before the self-join (a shingle in
    k docs contributes k² join rows — one stop-word-like shingle in
    every document IS the O(n²) blowup).  Sizes and intersections are
    both computed over the capped shingle set, so the Jaccard stays
    internally consistent; scores shift only for pairs whose overlap
    was dominated by near-universal shingles — exactly the pairs that
    are spurious at corpus scale.
    """
    # the shingle table feeds both join sides, the size table and (with
    # max_df) the hot-shingle aggregate — persist the RAW frame before
    # deriving anything, or the dominant explode+distinct shuffle runs
    # once per consumer (cachepool-owned: released at the next query
    # boundary).  ``_shingles`` lets a composed pipeline (curate_corpus)
    # hand in an already-tracked shingle frame so the corpus is
    # exploded once per run, not once per stage.
    sh = (
        _shingles
        if _shingles is not None
        else cachepool.track(doc_shingles(docs, text_col, id_col, ngram))
    )
    if max_df is not None:
        sh = _drop_hot_keys(sh, ["shingle"], max_df)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return _jaccard_from_intersections(inter, sh, threshold)


#: per-worker memo for the fused profile kernel: shingle -> its
#: ``num_hashes`` md5 digests, keyed by the hash-family size.  Corpora
#: repeat shingles heavily (that is the premise of near-dedup — the
#: bench corpus measures ~10% unique), so most lookups hit.  Bounded:
#: cleared when it outgrows the cap, so a pathological vocabulary can
#: never OOM a long-lived reused worker (guide §4.5).
_PROFILE_MEMO: dict = {}
_PROFILE_MEMO_CAP = 1 << 17


def _profile_kernel(
    num_hashes: int, ngram: int, include_size: bool, include_shingles: bool
):
    """mapInArrow body for the fused per-document profile: tokenize →
    n-gram shingle set → md5 MinHash family, one Python pass (guide
    §4.2: the JVM higher-order-function chain is interpreted, and the
    8-way md5 family measured ~11× slower per hash than hashlib; the
    whole kernel is a narrow map — no shuffle, schema identical to the
    JVM projection it replaces, bit-for-bit).

    Exactness notes (each pinned by tests/test_dedup.py parity):
    - tokens: Java ``\\s+`` is the ASCII class [ \\t\\n\\x0B\\f\\r] —
      replicated literally (Python's ``\\s`` is Unicode-wide and would
      split more);
    - shingle set: first-occurrence order, as ``array_distinct``;
    - sig_i = min md5(shingle ‖ '#i') as lowercase hex — ASCII min
      equals Spark's UTF8 binary ordering;
    - md5 state for a shingle is computed once and ``copy()``-extended
      per suffix (md5(s ‖ '#i') exactly, ~2× cheaper than k full
      hashes).
    """
    import re as _re

    import pyarrow as pa

    ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    from hashlib import md5 as _md5

    suffixes = [f"#{i}".encode() for i in range(num_hashes)]

    def run(batches):
        # resolve the memo through the importable module ON THE WORKER:
        # a closure-captured dict is pickled by value per task and would
        # reset every task; the module global survives for the lifetime
        # of a reused python worker process (guide §4.5)
        from latex_ocr_spark.operators.dedup import _PROFILE_MEMO

        memo = _PROFILE_MEMO.setdefault(num_hashes, {})
        for rb in batches:
            texts = rb.column("__text").to_pylist()
            keep, shingle_sets, sigs = [], [], [[] for _ in range(num_hashes)]
            sizes = []
            for row_i, text in enumerate(texts):
                if text is None:
                    continue
                toks = [t for t in ws.split(text) if t]
                if ngram == 1:
                    sh = list(dict.fromkeys(toks))
                else:
                    sh = list(
                        dict.fromkeys(
                            " ".join(toks[j : j + ngram])
                            for j in range(len(toks) - ngram + 1)
                        )
                    )
                if not sh:
                    continue
                best = None
                for s in sh:
                    digs = memo.get(s)
                    if digs is None:
                        if len(memo) >= _PROFILE_MEMO_CAP:
                            memo.clear()
                        h = _md5(s.encode())
                        digs = []
                        for suf in suffixes:
                            hi = h.copy()
                            hi.update(suf)
                            digs.append(hi.hexdigest())
                        memo[s] = digs
                    if best is None:
                        best = list(digs)
                    else:
                        for i in range(num_hashes):
                            if digs[i] < best[i]:
                                best[i] = digs[i]
                keep.append(row_i)
                if include_shingles:
                    shingle_sets.append(sh)
                if include_size:
                    sizes.append(len(sh))
                for i in range(num_hashes):
                    sigs[i].append(best[i])
            cols = [rb.column("id").take(pa.array(keep, type=pa.int32()))]
            names = ["id"]
            if include_shingles:
                cols.append(pa.array(shingle_sets, type=pa.list_(pa.string())))
                names.append("shingles")
            for i in range(num_hashes):
                cols.append(pa.array(sigs[i], type=pa.string()))
                names.append(f"sig_{i}")
            if include_size:
                cols.append(pa.array(sizes, type=pa.int64()))
                names.append("n_shingles")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return run


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    _shingles: DataFrame | None = None,
    include_size: bool = False,
    _arrs: DataFrame | None = None,
    include_shingles: bool = False,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) MinHash signature per document.

    Hash family: md5(shingle ‖ '#i') — engine-portable and seedless, so
    the DuckDB oracle reproduces it bit-for-bit.  Default path is a
    row-wise projection over :func:`doc_shingle_arrays` (or a caller's
    ``_arrs`` frame): zero exchanges.  ``_shingles`` (exploded
    (id, shingle) rows — the streaming survivor index's on-disk format)
    keeps the aggregated path.

    ``include_size`` adds an ``n_shingles`` count column: the verify
    stage needs per-doc shingle counts for the Jaccard denominator, and
    computing them in the same pass instead of a second ``groupBy("id")``
    over a shingle frame saves a full corpus-wide exchange.

    ``include_shingles`` (arrays path only) keeps the ``shingles``
    array column alongside the signatures, making the output the ONE
    per-document "profile" frame the whole LSH family can share: a
    single ``cachepool.track`` of it replaces the r7-early pattern of
    two stacked caches (arrays + signatures), whose builds raced each
    other inside one action and re-ran the corpus scan + tokenize +
    hash family once per cache layer (guide §1.2 step 1 / §5 caching).
    """
    if _shingles is not None:
        # exploded (id, shingle) input — the durable-index format the
        # streaming near-dedup persists; aggregate it as before (min is
        # duplicate-insensitive, so distinctness is not required)
        aggs = [
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"sig_{i}")
            for i in range(num_hashes)
        ]
        if include_size:
            aggs.append(F.count(F.lit(1)).alias("n_shingles"))
        return _shingles.groupBy("id").agg(*aggs)
    if _arrs is None and docs is not None and num_hashes > 0:
        # fused Arrow path (r7): when the shingle sets must be built
        # from text anyway, tokenize + shingle + the whole md5 MinHash
        # family run in ONE narrow Python kernel — the JVM
        # higher-order-function chain is interpreted and the 8-hash md5
        # family measured 134 core-seconds for 50k docs (~6.4 µs/hash)
        # vs hashlib's ~0.6 µs; bit-identical output and schema
        # (parity-pinned), zero exchanges either way.  Callers that
        # already hold an arrays frame (_arrs) keep the JVM projection.
        from pyspark.sql import types as T

        src = _with_min_parallelism(
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
        )
        fields = [T.StructField("id", src.schema["id"].dataType, True)]
        if include_shingles:
            fields.append(
                T.StructField("shingles", T.ArrayType(T.StringType()), True)
            )
        fields += [
            T.StructField(f"sig_{i}", T.StringType(), True)
            for i in range(num_hashes)
        ]
        if include_size:
            fields.append(T.StructField("n_shingles", T.LongType(), True))
        return src.mapInArrow(
            _profile_kernel(num_hashes, ngram, include_size, include_shingles),
            schema=T.StructType(fields),
        )
    # row-wise path: per-document min over the shingle-set's hash family
    # — a plain projection, no groupBy exchange (guide §2.4).  min over
    # the distinct set equals min over the multiset, and n_shingles is
    # the set size, so both paths agree bit-for-bit (n_shingles cast to
    # long to keep the aggregated schema, which the streaming index
    # persists on disk).
    arrs = (
        _arrs
        if _arrs is not None
        else doc_shingle_arrays(docs, text_col, id_col, ngram)
    )
    sh = F.col("shingles")

    def _minhash(i: int):
        # closure helper, NOT a default-arg lambda: pyspark counts the
        # lambda's parameters to decide unary vs (element, index) form
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"#{i}"))))
        ).alias(f"sig_{i}")

    cols = [_minhash(i) for i in range(num_hashes)]
    if include_size:
        cols.append(F.size(sh).cast("long").alias("n_shingles"))
    if include_shingles:
        cols = [sh.alias("shingles")] + cols
    return arrs.filter(F.size(sh) > 0).select("id", *cols)


def _band_keyed(sig: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """(id, band_idx, band_key) — one row per LSH band per document;
    band_key = md5 over the band's signature slots.  Shared by the
    self-join candidate path and the cross-corpus path so the band
    family can never drift between them."""
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
                )
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("id", F.posexplode(bands).alias("band_idx", "band_key"))


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    _shingles: DataFrame | None = None,
    max_bucket_size: int | None = None,
    _signatures: DataFrame | None = None,
    _arrs: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing any band key.

    Bands of ``band_size`` signature slots are hashed to a band key;
    candidates come from ONE hash aggregation on (band_idx, band_key)
    followed by in-bucket pair expansion (sorted id list → (i, j) with
    i < j, a plain generate) — which scales as the number of band-key
    collisions, not as n².  Versus the r1–r7-early band-key self-join
    this reads the keyed frame once instead of twice, needs no cache
    of it, folds the ``max_bucket_size`` guard into a free
    ``size(_ids)`` filter (the self-join needed a separate hot-key
    aggregation + broadcast anti-join), and — decisive for the
    cross-scale gate — exchanges the keyed rows at EVERY scale: the
    self-join's small-scale plan broadcast one side (zero shuffle
    bytes), so its shuffle bytes exploded by >1000× the moment scale
    pushed it over the broadcast threshold, reading as a quadratic to
    any bytes-growth monitor when it was really a strategy flip.  One
    groupBy exchange is the same bytes the sort-merge join would move
    for one side, and it grows linearly.

    ``max_bucket_size`` is the degenerate-key guard: a band key shared
    by k documents contributes k² pairs, so one monster bucket
    (e.g. a boilerplate page repeated a million times) IS the n²
    blowup.  Buckets above the cap are dropped.  That is a real recall
    trade, not a free lunch: an *exact*-dup family is recovered
    losslessly by running ``exact_duplicates`` first, but a huge family
    of near-identical (non-byte-equal) pages loses its candidate pairs
    entirely — when such families are expected, fingerprint-normalize
    first (``textstats.fingerprints``) or raise the cap and pay the
    expansion.
    """
    sig = (
        _signatures
        if _signatures is not None
        else minhash_signatures(
            docs, num_hashes, text_col, id_col, ngram, _shingles, _arrs=_arrs
        )
    )
    keyed = _band_keyed(sig, num_hashes, band_size)
    buckets = keyed.groupBy("band_idx", "band_key").agg(
        F.array_sort(F.collect_list("id")).alias("_ids")
    )
    # singleton buckets (the overwhelming majority) yield no pairs;
    # with a cap, oversized buckets drop exactly as the hot-key
    # anti-join did (every pair of a dropped bucket disappears)
    max_ids = max_bucket_size if max_bucket_size is not None else None
    buckets = buckets.filter(
        (F.size("_ids") >= 2)
        & ((F.size("_ids") <= max_ids) if max_ids is not None else F.lit(True))
    )
    # (a, b) with a < b from the sorted list: element i pairs with
    # every later element — identical pair set to the old
    # a.id < b.id equi-join, deduped across bands as before
    return (
        buckets.select(F.col("_ids"), F.posexplode("_ids").alias("_i", "a_id"))
        .select(
            "a_id",
            F.explode(
                F.slice("_ids", F.col("_i") + F.lit(2), F.size("_ids"))
            ).alias("b_id"),
        )
        .distinct()
    )


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    max_bucket_size: int | None = None,
    _arrs: DataFrame | None = None,
    _signatures: DataFrame | None = None,
    assume_small_pairs: bool = True,
) -> DataFrame:
    """The production near-dup plan: LSH candidates → exact Jaccard
    re-check on candidates only.

    Replaces the exact inverted-index self-join whose cost explodes on
    hot shingles; here the quadratic step is bounded by collisions in
    2^(128/band) band-key space.  Recall is that of MinHash-LSH
    (tunable via num_hashes/band_size); precision is exact.

    Plan shape (r7): shingle SETS stay inside their rows
    (:func:`doc_shingle_arrays`); signatures are a projection; the only
    corpus-wide exchange is the band-key equi-join of the narrow
    (id, band_idx, band_key) frame, and the exact verify joins the
    (small) candidate pair list back to the per-document arrays and
    counts ``array_intersect`` — the exploded shingle relation, its
    distinct exchange, the signature groupBy and the two verify-side
    shingle shuffles of r1-r6 are all gone (guide §2.4, §8: shuffle the
    lightweight proxy, keep payloads where they were read).
    ``_arrs`` = caller-provided (tracked) shingle-array frame, so a
    composed pipeline tokenizes the corpus once per run; ``_signatures``
    = caller-provided (tracked) ``minhash_signatures(...,
    include_size=True)`` frame over those arrays.
    """
    if _arrs is None and _signatures is None:
        # ONE cached per-document profile (shingle set + signatures +
        # size) instead of two stacked caches: inside a single action
        # each un-materialized cache layer used to re-run the corpus
        # scan + tokenize + md5 family for its own build (the layers
        # race; neither sees the other populated), which multiplied
        # the dominant compute by the number of layers.
        profile = cachepool.track(
            minhash_signatures(
                docs, num_hashes, text_col, id_col, ngram,
                include_size=True, include_shingles=True,
            )
        )
        arrs, sig = profile, profile
    else:
        arrs = (
            _arrs
            if _arrs is not None
            else cachepool.track(doc_shingle_arrays(docs, text_col, id_col, ngram))
        )
        sig = (
            _signatures
            if _signatures is not None
            else minhash_signatures(
                docs, num_hashes, text_col, id_col, ngram, _arrs=arrs,
                include_size=True,
            )
        )
    cand = lsh_candidate_pairs(
        docs, num_hashes, band_size, text_col, id_col, ngram,
        max_bucket_size=max_bucket_size, _signatures=sig,
    )
    # the candidate list is collision-bounded (the premise of LSH) and
    # the same order of magnitude as the pair/cluster frames the
    # composed pipelines already treat as broadcast-small; hinting it
    # (and the pair-sized intermediate of the first verify join) keeps
    # BOTH verify joins' build sides candidate-bounded, so the corpus
    # shingle arrays are never shuffled OR broadcast — without the
    # second hint the planner picked the full array frame as the
    # second join's build side, a corpus-sized broadcast (measured
    # ~5.8 s build+collect at 50k docs, an OOM at real scale).
    # ``assume_small_pairs=False`` drops the hints (a forced broadcast
    # overrides Spark's size checks) and lets AQE decide.
    return _jaccard_from_arrays(
        cand, arrs, threshold, pairs_small=assume_small_pairs
    )


def _jaccard_from_arrays(
    cand: DataFrame,
    arrs_a: DataFrame,
    threshold: float,
    arrs_b=None,
    pairs_small: bool = False,
) -> DataFrame:
    """(a_id, b_id, jaccard) for candidate pairs, by joining the (small)
    pair list to per-document shingle arrays and intersecting in-row:
    |A∩B| via ``array_intersect`` over the distinct sets — bit-identical
    to the exploded-join count, with zero corpus-side shuffle.

    ``pairs_small`` broadcast-hints the candidate-derived side of BOTH
    joins (the pair list into the first, the pair+a-side-arrays result
    into the second), so the array frame streams through each join as
    the probe side.  Without the second hint the planner — going off
    size estimates — picked the FULL corpus array frame as the second
    join's build side: a corpus-sized broadcast, the exact
    "every explicit broadcast is an OOM liability" class (guide §3.1),
    and measured seconds of build+collect at bench scale.  ``arrs_b``
    = b-side array frame when a_id and b_id come from different tables
    (may carry its own broadcast hint — e.g. a benchmark-small eval
    set — in which case the second join builds from it instead)."""
    _h = F.broadcast if pairs_small else (lambda df: df)
    a = arrs_a.select(
        F.col("id").alias("a_id"),
        F.col("shingles").alias("_a_sh"),
        F.size("shingles").alias("_a_n"),
    )
    b = (arrs_a if arrs_b is None else arrs_b).select(
        F.col("id").alias("b_id"),
        F.col("shingles").alias("_b_sh"),
        F.size("shingles").alias("_b_n"),
    )
    first = a.join(_h(cand), "a_id")
    if arrs_b is None:
        # self-join: the big side (b = the same corpus array frame)
        # must stay the probe — hint the pair-sized intermediate
        second = b.join(_h(first), "b_id")
    else:
        # cross-table: the b side is the caller's (typically tiny,
        # already-hinted) eval frame — keep it the build side
        second = first.join(b, "b_id")
    n_common = F.size(F.array_intersect("_a_sh", "_b_sh"))
    return (
        second.withColumn(
            "jaccard",
            F.round(n_common / (F.col("_a_n") + F.col("_b_n") - n_common), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id, cluster_id) connected components over near-dup pairs —
    the step a real dedup pipeline needs after pair generation: pairs
    say "A≈B, B≈C"; keeping one representative per *transitive* group
    requires the component, and the canonical id is its minimum.

    Spark-first iterative min-label propagation:

    - edges are symmetrized once and persisted (read every round);
    - each round joins labels to neighbors, takes the min over
      (own label, neighbor labels) — one shuffle per round;
    - convergence is checked with a count of changed labels (the
      loop-condition action); rounds needed = component diameter.
      Near-dup components are clique-like (every dup of a doc matches
      the doc), so diameter is small; ``max_iter`` bounds adversarial
      chains;
    - ``localCheckpoint`` severs lineage each round — without it the
      plan doubles per iteration and the job dies of planning long
      before it dies of data.

    Isolated documents (no pair) are not in the output — callers union
    them back as their own singletons if needed (cheap anti-join).
    """
    from pyspark.sql import Observation

    e = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # round 1 fused with label initialization (r7): labels start as
    # their own id, so the first round's neighbor-min is just min(dst)
    # per src — ONE aggregation job replaces the old distinct-
    # materialize job plus a join round.  Labels and the changed count
    # are identical (least(src, min(dst)) == least(label, min(neighbor
    # labels)) when every label is its id), each round still propagates
    # one hop, so max_iter bounds the same number of propagation rounds
    # as before (pinned by the diameter-21 chain and the
    # non-convergence tests).
    obs0 = Observation()
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nbr"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("_nbr")).alias("label"),
        )
        .observe(
            obs0,
            F.sum(
                F.when(F.col("label") != F.col("id"), 1).otherwise(0)
            ).alias("changed"),
        )
        .select("id", "label")
        .localCheckpoint()
    )
    changed = int(obs0.get["changed"] or 0)
    for _ in range(1, max_iter):
        if changed == 0:
            break
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the changed-label count rides the SAME action that
        # materializes the round (localCheckpoint is eager): one job
        # per round instead of the old checkpoint-then-recount two —
        # at small pair counts the loop is pure per-job overhead, so
        # this halves its wall (guide §1.2 per-task work)
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("id", "label")
            .localCheckpoint()
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist(blocking=False)
    if changed != 0:
        # returning here would silently split true components —
        # downstream dedup would keep several "canonical" copies of
        # one duplicate group
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still changing); a component's diameter "
            f"exceeds max_iter — raise it (rounds are cheap; each is one "
            f"shuffle)"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def duplicate_clusters_star(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id, cluster_id) connected components via alternating
    large-star / small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — same output
    contract as :func:`duplicate_clusters`, different round bound.

    Min-label propagation needs rounds = component DIAMETER: fine for
    clique-like near-dup clusters (diameter ~2), quadratic wall on an
    adversarial chain (A≈B≈C≈…, e.g. a document edited repeatedly
    with each version near-dup'ing only its neighbors).  Star
    contraction converges in O(log² n) rounds regardless of shape —
    each round is two groupBy shuffles instead of one join shuffle, so
    per-round cost is ~2× and the win only shows on high-diameter
    topologies; pick it when near-dup chains are expected
    (tests/test_dedup.py pins a 64-chain to ≤ 10 rounds, where
    propagation would exceed its 25-round cap and raise).

    - large-star: every node points its LARGER neighbors at its
      minimum neighborhood member (incl. itself);
    - small-star: every node points its smaller-or-equal neighbors
      (and itself) at that minimum;
    - converged when a round leaves the edge set unchanged — the
      edges then form stars (node → component minimum);
    - ``localCheckpoint`` severs lineage each round, as in
      :func:`duplicate_clusters`.
    """
    e = pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _large_star(ed: DataFrame) -> DataFrame:
        # symmetric input: N(u) = {v : (u,v) ∈ ed}
        m = ed.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least(F.col("_mn"), F.col("u")).alias("m")
        )
        return (
            ed.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # orient toward the smaller endpoint: big groups its smalls
        oriented = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        joined = oriented.join(m, "u")
        links = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
        selfs = joined.select("u", F.col("m").alias("v")).distinct()
        return (
            links.unionByName(selfs)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _round in range(max_iter):
        after_large = _large_star(edges)
        # re-symmetrize for the next large-star's neighborhood view
        new_edges = _small_star(after_large).localCheckpoint()
        sym = new_edges.unionByName(
            new_edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct().localCheckpoint()
        # converged iff the (symmetrized) edge set is unchanged
        delta = (
            sym.exceptAll(edges).limit(1).count()
            + edges.exceptAll(sym).limit(1).count()
        )
        edges = sym
        if delta == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters_star did not converge in {max_iter} "
            "alternating rounds — raise max_iter (bound is O(log² n); "
            "this should never trip on real components)"
        )
    # stars: every edge points at the component minimum; roots appear
    # only on the right side — add their self-rows.  Nodes whose ONLY
    # pair was a self-loop (a, a) were dropped by the u != v edge
    # filter up front; propagation emits them as singleton clusters,
    # so the same-output contract restores them here.
    stars = edges.filter(F.col("u") > F.col("v"))
    roots = stars.select(F.col("v").alias("u"), F.col("v")).distinct()
    self_loops = (
        pairs.filter(F.col("a_id") == F.col("b_id"))
        .select(F.col("a_id").alias("u"), F.col("a_id").alias("v"))
        .distinct()
    )
    return (
        stars.unionByName(roots)
        .unionByName(self_loops)
        .groupBy("u")
        .agg(F.min("v").alias("cluster_id"))
        .select(F.col("u").alias("id"), "cluster_id")
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document — zero shuffles.

    Token hash = xxhash64 (Spark-native, stable across sessions).  The
    input has one row per document: token hashing is one codegen'd JVM
    projection, and the 64-bit vote fold runs vectorized in numpy over
    whole Arrow batches (``mapInArrow``); nothing ever leaves its scan
    partition.  (The r1 implementation exploded 64 rows per token
    through two shuffles: 64× shuffle amplification for a
    metadata-sized output.  Parity with it is frozen in
    tests/test_dedup.py and resources/goldens/simhash64.parquet.)

    Documents with zero tokens are dropped (the r1 explode semantics).

    Zero *inherent* shuffles: on an already-parallel scan (any corpus-
    scale input) the plan is scan→filter→project with no exchange —
    asserted in tests/test_plan_shapes.py.  The amplification guard
    adds one fan-out exchange ONLY when the input is a single
    under-parallel split (test-scale parquet), where the per-row
    64-vote fold would otherwise serialize on one core.
    """
    from pyspark.sql import types as T

    docs = _with_min_parallelism(docs)
    toks = _tokens(text_col)
    # Token hashing stays JVM-side (xxhash64 is the Spark-native hash
    # the golden pins); the 64-bit VOTE fold moves to numpy inside
    # mapInArrow.  Per bit b the vote is Σ±1 = 2·(tokens with bit b
    # set) − T, and the output bit is vote > 0 ⇔ 2·count_b > T.  The
    # r6 expression computed that as a 64×T interpreted higher-order
    # fold per document — measured 13 s warm for 500k docs on 32
    # cores; unpackbits + add.reduceat + packbits does the identical
    # arithmetic vectorized over the whole Arrow batch (guide §4.2:
    # hand batches to native code rather than chaining interpreted
    # JVM expressions).  Bit-identical signatures (golden-pinned):
    # little-endian unpack/pack of the int64 bit pattern reproduces
    # shiftright(h, b) & 1 and Σ bit_b·2^b including the sign bit.
    hashed = (
        docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select("id", F.expr("transform(_toks, t -> xxhash64(t))").alias("_hashes"))
    )
    id_type = hashed.schema["id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type, True),
            T.StructField("simhash", T.LongType(), True),
        ]
    )

    def _vote(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            lst = rb.column("_hashes")
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            # flatten() honours the array's slice offset; offsets are
            # re-based to the flattened values
            offsets = np.asarray(lst.offsets)
            offsets = (offsets - offsets[0]).astype(np.int64)
            vals = np.asarray(lst.flatten(), dtype=np.int64)
            # bit matrix: little-endian byte view → one column per bit
            bits = np.unpackbits(
                vals.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)
            counts = np.add.reduceat(bits, offsets[:-1], axis=0)
            n_toks = np.diff(offsets).reshape(-1, 1)
            votes = (2 * counts) > n_toks
            sims = np.packbits(
                votes, axis=1, bitorder="little"
            ).view(np.int64).reshape(-1)
            yield pa.RecordBatch.from_arrays(
                [rb.column("id"), pa.array(sims, type=pa.int64())],
                names=["id", "simhash"],
            )

    return hashed.mapInArrow(_vote, schema=out_schema)


def cross_lsh_candidates(
    corpus: DataFrame,
    evalset: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    ngram: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    _corpus_shingles: DataFrame | None = None,
    _eval_shingles: DataFrame | None = None,
    max_bucket_size: int | None = None,
    _corpus_signatures: DataFrame | None = None,
    _eval_signatures: DataFrame | None = None,
    eval_is_small: bool = True,
) -> DataFrame:
    """(corpus_id, eval_id) candidate pairs ACROSS two corpora: corpus
    documents sharing any LSH band key with an eval document.

    The cross-table sibling of :func:`lsh_candidate_pairs` — same band
    family (``_band_keyed``) and the same ``ngram`` default, so a
    pipeline that dedups in-corpus and then decontaminates applies ONE
    similarity measure unless it opts out.  Work scales with band-key
    collisions between the tables — never |corpus| × |evalset|.  The
    eval side is typically tiny (a benchmark), so its keyed frame
    broadcasts and the candidate JOIN adds no corpus-side shuffle (the
    signature aggregation over the corpus shingles still shuffles once,
    as in every MinHash path).  ``max_bucket_size`` caps degenerate
    corpus-side buckets exactly as in the self-join path.
    """
    sh_c = (
        _corpus_shingles
        if _corpus_shingles is not None
        else doc_shingles(corpus, text_col, id_col, ngram)
    )
    sh_e = (
        _eval_shingles
        if _eval_shingles is not None
        else doc_shingles(evalset, text_col, id_col, ngram, parallel_hint=False)
    )
    sig_c = (
        _corpus_signatures
        if _corpus_signatures is not None
        else minhash_signatures(None, num_hashes, _shingles=sh_c)
    )
    sig_e = (
        _eval_signatures
        if _eval_signatures is not None
        else minhash_signatures(None, num_hashes, _shingles=sh_e)
    )
    keyed_c = _band_keyed(sig_c, num_hashes, band_size)
    keyed_e = _band_keyed(sig_e, num_hashes, band_size)
    if max_bucket_size is not None:
        keyed_c = _drop_hot_keys(keyed_c, ["band_idx", "band_key"], max_bucket_size)
    c, e = keyed_c.alias("c"), keyed_e.alias("e")
    # eval side is usually the small side: broadcast it so the
    # corpus-side keyed frame joins map-side with zero shuffle; an
    # oversized eval side (``eval_is_small=False``) drops the hint and
    # lets the planner/AQE decide
    if eval_is_small:
        e = F.broadcast(e)
    return (
        c.join(
            e,
            (F.col("c.band_idx") == F.col("e.band_idx"))
            & (F.col("c.band_key") == F.col("e.band_key")),
        )
        .select(F.col("c.id").alias("a_id"), F.col("e.id").alias("b_id"))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 2,
    ngram: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    _corpus_shingles: DataFrame | None = None,
    _corpus_signatures: DataFrame | None = None,
    evalset_is_small: bool = True,
    contaminated_is_small: bool = True,
    _corpus_arrs: DataFrame | None = None,
):
    """Benchmark decontamination: find (and enable dropping of) corpus
    documents that near-duplicate an eval/benchmark document — the
    guard against training on the test set.

    Returns ``(report, cleaned)``:

    - ``report`` — (corpus_id, eval_id, jaccard) for every corpus doc
      whose exact n-gram Jaccard against an eval doc clears
      ``threshold`` (LSH candidates → exact verify, same plan shape as
      :func:`lsh_verified_pairs` but cross-table);
    - ``cleaned`` — the corpus with those documents anti-joined out.

    Scale shape: the eval set is small (benchmarks are), so its
    shingle/signature frames broadcast; the corpus side is touched by
    exactly one scan + one shingle explode, and the quadratic step is
    bounded by cross-table band collisions.  ``_corpus_shingles`` lets
    a composed pipeline (curate_corpus) hand in the shingle frame its
    near-dup stage already built (survivor-filtered) — the corpus is
    then never re-exploded here (``_corpus_signatures`` likewise hands
    in the matching ``include_size=True`` signature frame — per-doc
    signatures are unaffected by dropping OTHER documents, so a
    survivor-filtered frame is exact).  ``max_bucket_size`` caps
    degenerate corpus-side band buckets exactly as in the self-join
    path.  ``evalset_is_small`` (default True — benchmarks are) skips
    the eval-side amplification fan-out and broadcast-hints the
    eval-side probes; pass False when decontaminating against a
    corpus-sized held-out set so the guard and join planner run
    normally.
    """
    if _corpus_shingles is not None:
        # exploded-corpus path: the streaming survivor index persists
        # (id, shingle) rows on disk and injects them here — keep the
        # aggregated/join verify for that format
        sh_c = _corpus_shingles
        sh_e = cachepool.track(
            doc_shingles(
                evalset, text_col, id_col, ngram,
                parallel_hint=not evalset_is_small,
            )
        )
        sig_c = (
            _corpus_signatures
            if _corpus_signatures is not None
            else cachepool.track(
                minhash_signatures(
                    None, num_hashes, _shingles=sh_c, include_size=True
                )
            )
        )
        sig_e = minhash_signatures(
            None, num_hashes, _shingles=sh_e, include_size=True
        )
        cand = cross_lsh_candidates(
            corpus, evalset, num_hashes, band_size, ngram, text_col, id_col,
            _corpus_shingles=sh_c, _eval_shingles=sh_e,
            max_bucket_size=max_bucket_size,
            _corpus_signatures=sig_c, _eval_signatures=sig_e,
            eval_is_small=evalset_is_small,
        )
        _eb = F.broadcast if evalset_is_small else (lambda df: df)
        a = sh_c.select(F.col("id").alias("a_id"), "shingle")
        b = sh_e.select(F.col("id").alias("b_id"), "shingle")
        inter = (
            cand.join(a, "a_id")
            .join(_eb(b), ["b_id", "shingle"])
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        report = cachepool.track(
            _jaccard_from_intersections(
                inter, sh_c, threshold, sh_b=sh_e,
                sizes=sig_c.select("id", "n_shingles"),
                # eval-side sizes are benchmark-small: broadcast, so the
                # report's denominator join never shuffles the inter frame
                sizes_b=_eb(sig_e.select("id", "n_shingles")),
            ).select(
                F.col("a_id").alias("corpus_id"),
                F.col("b_id").alias("eval_id"),
                "jaccard",
            )
        )  # consuming report AND cleaned must not re-run the LSH+verify chain
    else:
        # arrays path (r7 default): shingle sets stay row-wise, the
        # exact verify intersects per candidate pair — no exploded
        # relation, no distinct exchange, no signature groupBy (see
        # lsh_verified_pairs)
        if _corpus_arrs is None and _corpus_signatures is None:
            # ONE cached corpus profile (arrays + signatures + size):
            # two stacked caches would each re-run the corpus scan +
            # hash family for their own build (see lsh_verified_pairs)
            prof_c = cachepool.track(
                minhash_signatures(
                    corpus, num_hashes, text_col, id_col, ngram,
                    include_size=True, include_shingles=True,
                )
            )
            arrs_c, sig_c = prof_c, prof_c
        else:
            arrs_c = (
                _corpus_arrs
                if _corpus_arrs is not None
                else cachepool.track(
                    doc_shingle_arrays(corpus, text_col, id_col, ngram)
                )
            )
            sig_c = (
                _corpus_signatures
                if _corpus_signatures is not None
                else minhash_signatures(
                    None, num_hashes, _arrs=arrs_c, include_size=True
                )
            )
        # eval side is usually benchmark-small: skip the amplification
        # fan-out (a wasted exchange on a few hundred rows) unless told
        # otherwise
        arrs_e = cachepool.track(
            doc_shingle_arrays(
                evalset, text_col, id_col, ngram,
                parallel_hint=not evalset_is_small,
            )
        )
        sig_e = minhash_signatures(
            None, num_hashes, _arrs=arrs_e, include_size=True
        )
        cand = cross_lsh_candidates(
            corpus, evalset, num_hashes, band_size, ngram, text_col, id_col,
            max_bucket_size=max_bucket_size,
            _corpus_signatures=sig_c, _eval_signatures=sig_e,
            eval_is_small=evalset_is_small,
        )
        # candidates are bounded by cross-table band collisions — the
        # same frame the contaminated-id set derives from, so the same
        # smallness knob gates their broadcast into the first verify
        # join (the second builds from the eval-side arrays)
        report = cachepool.track(
            _jaccard_from_arrays(
                cand, arrs_c, threshold,
                arrs_b=F.broadcast(arrs_e) if evalset_is_small else arrs_e,
                pairs_small=contaminated_is_small,
            ).select(
                F.col("a_id").alias("corpus_id"),
                F.col("b_id").alias("eval_id"),
                "jaccard",
            )
        )  # consuming report AND cleaned must not re-run the LSH+verify chain
    contaminated = report.select(F.col("corpus_id").alias(id_col)).distinct()
    # contaminated ids are usually bounded by the (small) eval set's
    # match fan-out — broadcast, so cleaning the corpus is a map-side
    # anti-join with zero corpus shuffle.  ``contaminated_is_small=
    # False`` drops the hint for the case where boilerplate overlaps a
    # broad eval suite and the matched set grows corpus-proportional
    # (a forced broadcast overrides Spark's size checks and OOMs); AQE
    # still broadcasts at runtime when the set turns out small.
    cleaned = corpus.join(
        F.broadcast(contaminated) if contaminated_is_small else contaminated,
        id_col,
        "left_anti",
    )
    return report, cleaned
