"""End-to-end corpus curation: the composed pipeline a training-data
user actually runs, built from this repo's individually oracle-checked
operators:

    [redaction]            (textstats.redact_text — optional scrub)
      → quality gates        (textstats.quality_gate — inline filter,
                              id untouched at its own type)
      → exact dedup          (dedup.exact_duplicates, keep canonical)
      → near-dup clustering  (LSH+verify pairs by default — the scale
                              path — or capped exact Jaccard;
                              → duplicate_clusters, keep one
                              representative per cluster)
      → decontamination      (dedup.decontaminate vs an eval set,
                              REUSING the near-dup stage's shingles)
      → [sampling]           (textstats.deterministic_sample — optional
                              global or per-stratum down-sample)
      → cluster-safe split   (textstats.cluster_safe_split — near-dups
                              can't straddle train/val)

Single-pass design (round 4): the funnel counts ride on ``observe()``
metrics instead of per-stage ``count()`` actions, corpus-wide text
frames are never persisted (only the small pair/cluster/group frames
and the shingle frame — which genuinely feeds several joins — are
cachepool-tracked), and the corpus is shingle-exploded exactly ONCE:
the near-dup stage's shingle frame, survivor-filtered by a zero-shuffle
broadcast anti-join, is handed to the decontamination stage.  At test
scale this is invisible; at 100 TB the shingle explode and corpus-wide
materializations were the funnel's two dominant costs.

The funnel (docs in/out per stage) remains the curation run's primary
observability artifact — a stage that silently drops 90% of a corpus
should be visible in one table, not discovered downstream.  Collecting
it costs one action over the final frame (the pipeline's only full
pass besides the cluster loop's internal materializations).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from latex_ocr_spark import cachepool
from latex_ocr_spark.operators import dedup as D
from latex_ocr_spark.operators import textstats as TS


@dataclass
class CurationResult:
    """Outputs of one curation run.

    ``documents`` — surviving docs with a ``split`` column;
    ``funnel``   — [(stage, docs_in, docs_out), …] in execution order;
    ``contamination_report`` — (corpus_id, eval_id, jaccard), empty
    frame when no eval set was given;
    ``clusters`` — (id, cluster_id) duplicate clusters found.
    """

    documents: DataFrame
    funnel: List[Tuple[str, int, int]]
    contamination_report: Optional[DataFrame] = None
    clusters: Optional[DataFrame] = None
    #: set when curate_corpus ran with collect_funnel=False: call
    #: resolve_funnel() AFTER your own FULL action on ``documents``
    #: (takes the optional exact final count for the anomaly check)
    _funnel_resolver: Optional[
        Callable[[Optional[int]], List[Tuple[str, int, int]]]
    ] = field(default=None, repr=False)

    def funnel_dict(self) -> Dict[str, Tuple[int, int]]:
        return {s: (i, o) for s, i, o in self.funnel}

    def resolve_funnel(self, verify: bool = False) -> List[Tuple[str, int, int]]:
        """Populate ``funnel`` in deferred mode (collect_funnel=False).

        CONTRACT: the resolving action must be a FULL pass over
        ``documents`` — a sink write or a ``count()``.  A partial
        action (``take``/``show``/``limit``-then-collect)
        short-circuits the scan, so every observation captures only
        the rows the partial action happened to pull and the funnel
        silently reports partial counts.  Call this after that full
        action; calling it before any action BLOCKS until one runs.
        No-op when the funnel was already collected.

        ``verify=True`` additionally runs one exact ``count()`` over
        ``documents`` and cross-checks it against the last observed
        stage count, raising on mismatch — the same metrics-anomaly
        guard collected mode always applies (it catches both a
        partial resolving action and a double-applied CollectMetrics
        subtree under stage re-execution), at the price of one extra
        pipeline pass.  In-repo callers (jobs, bench) write the full
        frame, so they keep the zero-extra-pass default."""
        if self._funnel_resolver is not None:
            n_final = self.documents.count() if verify else None
            self.funnel = self._funnel_resolver(n_final)
            self._funnel_resolver = None
        return self.funnel

    def write_bucketed(
        self, table: str, num_buckets: int = 64, id_col: str = "doc_id"
    ) -> None:
        """Persist the curated documents as a bucketed (and bucket-
        sorted) managed table on the id — the storage layout that makes
        every downstream J1-class join on the id exchange-free
        (sources/bucketed.py; plan asserted in
        tests/test_bucketed_join.py).  The natural sink for a corpus
        that training-data jobs will repeatedly join metadata onto."""
        from latex_ocr_spark.sources.bucketed import write_bucketed

        write_bucketed(self.documents, table, key=id_col, num_buckets=num_buckets)


def _count(name: str):
    return F.count(F.lit(1)).alias(name)


def curate_corpus(
    docs: DataFrame,
    evalset: Optional[DataFrame] = None,
    *,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    dedup_threshold: float = 0.5,
    near_dup_method: str = "lsh",
    ngram: int = 1,
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: Optional[int] = None,
    max_df: Optional[int] = None,
    redact: bool = False,
    sample_fraction: Optional[float] = None,
    val_fraction: float = 0.1,
    seed: str = "split-seed-1",
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_funnel: bool = True,
    assume_small_side_frames: bool = True,
) -> CurationResult:
    """Run the full curation funnel; see module docstring.

    ``collect_funnel``: True (default) runs one count action over the
    final frame so ``CurationResult.funnel`` is populated on return.  A
    consumer that will immediately run its own FULL action (write the
    documents to a sink, count them — not take/show/limit, which
    would capture partial counts; see ``resolve_funnel``) should pass
    False and call ``resolve_funnel()`` AFTER that action — the
    observation metrics
    ride the consumer's pass, so the funnel costs zero extra passes
    over the corpus (at 100 TB the dedicated count pass roughly doubles
    funnel cost; jobs/curate_job.py uses the deferred mode).

    ``assume_small_side_frames``: True (default) broadcast-hints the
    dropped-near-dup id set and the cluster table into their
    anti-/split-joins — zero-shuffle probes, correct for benchmark and
    moderate-dup corpora.  For a high-dup-rate corpus at scale (a web
    crawl where 20-30% of documents sit in dup groups, making these
    frames gigabytes) pass False: an explicit broadcast hint OVERRIDES
    Spark's size checks and would OOM, while AQE still converts the
    unhinted joins to broadcast at runtime whenever the frames turn
    out small.

    Funnel counts are ``df.observe()`` metrics (accumulator-backed).
    In collected mode the final observed count is cross-checked against
    the exact ``count()`` from the same action and a mismatch raises —
    the anomaly a re-executed stage (speculation, shuffle-fetch retry)
    could in principle introduce by re-applying a CollectMetrics
    subtree.  Failed task attempts never contribute (Spark excludes
    them from metric accumulators).

    Near-dup handling keeps each cluster's canonical (minimum-id)
    member — the reference's memo/set-dedup policy generalized.  The
    final split hashes by cluster canonical id even though only
    canonicals survive, so re-adding a dropped near-dup later can
    never land it on the other side of the split.

    ``near_dup_method``: ``'lsh'`` (default) generates pairs with the
    production MinHash-LSH + exact-verify plan — the 100 TB path,
    quadratic work bounded by band collisions, ``max_bucket_size``
    capping degenerate buckets (the k² blowup on a huge boilerplate
    family).  Recall is probabilistic for borderline pairs: with the
    default 8 hashes / band size 2, a pair exactly AT threshold 0.5
    collides in some band ~68% of the time (1-(1-s^2)^4) while a
    0.9-jaccard pair is found >99.97% — raise ``num_hashes`` (more
    bands) to buy recall near the threshold, so the docstring's
    "near-dups can't straddle the split" guarantee is exact only for
    pairs LSH surfaces.  ``'jaccard'`` uses the exact inverted-index
    self-join (``max_df`` hot-shingle cap, default 1000) —
    deterministic full recall, the right choice for small corpora and
    for pinning exact counts in tests.  ``max_df`` applies only to
    'jaccard' and ``max_bucket_size``/``num_hashes``/``band_size``
    only to 'lsh'; setting one for the other method raises rather
    than silently ignoring a blowup mitigation.

    One similarity measure end-to-end: ``ngram``, ``num_hashes``,
    ``band_size`` and ``max_bucket_size`` are forwarded to the
    decontamination stage too (which always runs the LSH plan — its
    cross-table candidate step has no exact variant), so raising
    recall knobs raises them for BOTH near-dup detection and
    decontamination.
    """
    if near_dup_method not in ("lsh", "jaccard"):
        raise ValueError(
            f"near_dup_method must be 'lsh' or 'jaccard', got {near_dup_method!r}"
        )
    if near_dup_method == "lsh" and max_df is not None:
        raise ValueError("max_df applies to near_dup_method='jaccard'; "
                         "use max_bucket_size for the LSH path")
    if near_dup_method == "jaccard" and max_bucket_size is not None:
        raise ValueError("max_bucket_size applies to near_dup_method='lsh'; "
                         "use max_df for the exact path")

    cur = docs.select(id_col, text_col)
    if redact:
        # row-preserving scrub BEFORE any text-derived signal, so
        # hashes/shingles/profiles see what training will see
        cur = TS.redact_text(cur, text_col=text_col, out_col=text_col)
    obs_in = Observation()
    cur = cur.observe(obs_in, _count("n"))

    # 1. quality gates — a plain filter over the profile expressions
    # (id untouched at its own type: string-id corpora survive; the
    # old profile-then-semi-join formulation cost an id shuffle AND
    # nullified string ids through the profile's id cast)
    obs_q = Observation()
    cur2 = (
        TS.quality_gate(
            cur, min_tokens=min_tokens, max_punct_ratio=max_punct_ratio,
            text_col=text_col,
        )
        # a row without an id cannot be deduplicated, decontaminated or
        # split — drop it HERE, counted, rather than letting the exact-
        # dedup join's implicit isNotNull filter swallow it.  (That
        # implicit filter would also be PUSHED DOWN below the observe
        # nodes, silently skewing every upstream funnel count for
        # NULL-id corpora — observed metrics count what flows through
        # the node's post-pushdown position.)
        .filter(F.col(id_col).isNotNull())
        .observe(obs_q, _count("n"))
    )

    # 2. exact dedup — keep the canonical (min id) of each text group;
    # remember every >1-group's membership so exact duplicates get
    # cluster rows too (without them, a dropped exact copy re-added
    # later would split-hash by its own id and could straddle its
    # canonical — the leakage the cluster-safe split exists to prevent).
    # ``groups`` is narrow (hash, id, count) and feeds two consumers —
    # it persists; the corpus text frames do NOT (recomputing a pruned
    # scan+filter is cheaper than caching the corpus at scale).
    groups = cachepool.track(
        D.exact_duplicates(cur2, text_col=text_col, id_col=id_col)
    )
    canonical = groups.select(F.col("canonical_id").alias(id_col))
    exact_members = (
        cur2.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash"))
        .join(
            groups.filter(F.col("dup_count") > 1).select("text_hash", "canonical_id"),
            "text_hash",
        )
        .select("id", "canonical_id")
    )
    obs_e = Observation()
    cur3 = cur2.join(canonical, id_col, "left_semi").observe(obs_e, _count("n"))

    # 3. near-dup clustering — keep one representative per cluster.
    # THE shingle frame: built once here, reused by the pair generator
    # (signatures / candidates / verify) AND — survivor-filtered — by
    # the decontamination stage.  One corpus tokenization per funnel
    # run.  The LSH path keeps shingle SETS row-wise (doc_shingle_arrays
    # — no explode, no distinct exchange, no signature groupBy); the
    # exact-jaccard path still needs the exploded inverted index.
    sh3 = None
    arrs3 = None
    sig3 = None
    if near_dup_method == "lsh":
        # ONE cached per-document profile (shingle set + signatures +
        # size) for the whole funnel: the near-dup stage and
        # (survivor-filtered) the decontamination stage both read this
        # frame — per-doc signatures are unaffected by dropping other
        # documents, so the filtered reuse is exact.  One cache layer,
        # not two (arrays + signatures): stacked caches raced their
        # builds inside the cluster loop's first action and re-ran the
        # corpus tokenize + hash family once per layer.
        arrs3 = cachepool.track(
            D.minhash_signatures(
                cur3, num_hashes, text_col, id_col, ngram,
                include_size=True, include_shingles=True,
            )
        )
        sig3 = arrs3
        raw_pairs = D.lsh_verified_pairs(
            cur3, threshold=dedup_threshold, num_hashes=num_hashes,
            band_size=band_size, text_col=text_col, id_col=id_col,
            ngram=ngram, max_bucket_size=max_bucket_size, _arrs=arrs3,
            _signatures=sig3, assume_small_pairs=assume_small_side_frames,
        )
    else:
        sh3 = cachepool.track(
            D.doc_shingles(cur3, text_col=text_col, id_col=id_col, ngram=ngram)
        )
        raw_pairs = D.jaccard_pairs(
            cur3, threshold=dedup_threshold, text_col=text_col, id_col=id_col,
            ngram=ngram, max_df=max_df if max_df is not None else 1000,
            _shingles=sh3,
        )
    pairs = cachepool.track(raw_pairs)
    # unconditional: duplicate_clusters is typed from the pairs frame
    # and converges in one (empty) round when there are no near-dups,
    # so the funnel plans identically with and without them — and the
    # old pairs.take(1) probe job is gone
    near_clusters = D.duplicate_clusters(pairs)
    non_canonical = near_clusters.filter(
        F.col("id") != F.col("cluster_id")
    ).select(F.col("id").alias(id_col))
    _maybe_bcast = F.broadcast if assume_small_side_frames else (lambda df: df)
    obs_n = Observation()
    cur4 = cur3.join(_maybe_bcast(non_canonical), id_col, "left_anti").observe(
        obs_n, _count("n")
    )

    # full cluster table = near-dup components ∪ exact-dup groups, the
    # latter resolved THROUGH their canonical's near-dup cluster when
    # one exists (A≡B exact, A≈C near → B's cluster is C's cluster id)
    exact_resolved = (
        exact_members.join(
            near_clusters.select(
                F.col("id").alias("canonical_id"), F.col("cluster_id").alias("_near_cl")
            ),
            "canonical_id",
            "left",
        )
        .select(
            "id", F.coalesce("_near_cl", "canonical_id").alias("cluster_id")
        )
    )
    clusters = cachepool.track(
        near_clusters.unionByName(exact_resolved)
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    # 4. decontamination vs the eval set — on the SAME shingle frame
    # the near-dup stage used, filtered to survivors by a map-side
    # anti-join against the (small, already-broadcast) dropped-id set;
    # the corpus is never re-exploded, and the recall knobs carry over
    obs_d = None
    report = None
    cur5 = cur4
    cur5_decon = cur4  # the decontaminate-stage output frame, pinned
    # BEFORE optional sampling: the degenerate-path fallback in
    # _build_funnel counts this frame when obs_d's metric is absent,
    # and counting the post-sample frame there would report the
    # sampled count as the decontaminate stage's 'out'
    if evalset is not None:
        dropped = _maybe_bcast(non_canonical.withColumnRenamed(id_col, "id"))
        sig4 = sig3.join(dropped, "id", "left_anti") if sig3 is not None else None
        report, cur5 = D.decontaminate(
            cur4, evalset, threshold=dedup_threshold,
            num_hashes=num_hashes, band_size=band_size,
            ngram=ngram, text_col=text_col, id_col=id_col,
            max_bucket_size=max_bucket_size,
            _corpus_shingles=(
                sh3.join(dropped, "id", "left_anti") if sh3 is not None else None
            ),
            _corpus_arrs=(
                arrs3.join(dropped, "id", "left_anti") if arrs3 is not None else None
            ),
            _corpus_signatures=sig4,
            contaminated_is_small=assume_small_side_frames,
        )
        obs_d = Observation()
        cur5 = cur5.observe(obs_d, _count("n"))
        cur5_decon = cur5

    # 5b. optional down-sample (deterministic, subset-stable)
    obs_s = None
    if sample_fraction is not None:
        obs_s = Observation()
        cur5 = TS.deterministic_sample(
            cur5, fraction=sample_fraction, id_col=id_col, seed=seed + ":sample"
        ).observe(obs_s, _count("n"))

    # 6. cluster-safe split (near-dups hash by their cluster canonical)
    out = TS.cluster_safe_split(
        cur5, clusters, val_fraction=val_fraction, id_col=id_col, seed=seed,
        clusters_are_small=assume_small_side_frames,
    )

    def _build_funnel(n_final: Optional[int]) -> List[Tuple[str, int, int]]:
        def _n(obs: Observation, frame: DataFrame) -> int:
            try:
                return int(obs.get["n"])
            except Exception:
                # a degenerate pipeline (e.g. every id NULL) can empty
                # a broadcast join side at runtime; AQE then skips the
                # whole probe branch, the CollectMetrics nodes on it
                # never execute, and their observations complete with
                # schema-less empty rows that pyspark's Observation.get
                # cannot convert (toPyRow asserts).  Read the JVM map
                # directly; when the metric is genuinely absent (node
                # skipped), count the frame itself — an extra action
                # only on this degenerate path, where the spine is
                # near-empty and cheap, and the funnel MUST still
                # report true stage counts (the zero-survivors warning
                # keys off them).
                try:
                    m = obs._jo.getAsJava()
                    if m.containsKey("n"):
                        return int(m.get("n"))
                except Exception:
                    pass
                return frame.count()

        n, n2, n3, n4 = (
            _n(obs_in, cur), _n(obs_q, cur2), _n(obs_e, cur3), _n(obs_n, cur4)
        )
        funnel: List[Tuple[str, int, int]] = []
        if redact:
            funnel.append(("redact", n, n))
        funnel.append(("quality_gates", n, n2))
        funnel.append(("exact_dedup", n2, n3))
        funnel.append(("near_dup_clusters", n3, n4))
        n5 = _n(obs_d, cur5_decon) if obs_d is not None else n4
        funnel.append(("decontaminate", n4, n5))
        if obs_s is not None:
            n5b = _n(obs_s, cur5)
            funnel.append(("sample", n5, n5b))
            n5 = n5b
        if n_final is not None and n_final != n5:
            # the split preserves rows, and n_final came from an exact
            # count in the same action that resolved the last
            # observation — a mismatch means the observed metrics
            # double-applied (e.g. a resubmitted stage re-ran a
            # CollectMetrics subtree); surface it rather than report a
            # corrupted funnel
            raise RuntimeError(
                f"funnel metrics anomaly: last observed stage count {n5} "
                f"!= exact final count {n_final} (observation metrics "
                f"double-applied under task/stage re-execution?)"
            )
        funnel.append(("split", n5, n_final if n_final is not None else n5))
        return funnel

    if collect_funnel:
        # the funnel's single action: materializes the whole pipeline
        # once and resolves every pending observation (the early ones
        # were already captured by the cluster loop's internal
        # materializations, whose lineage runs through the same
        # observed spine)
        funnel = _build_funnel(out.count())
        resolver = None
    else:
        # deferred mode: the caller's own sink action resolves the
        # observations — the funnel costs zero extra pipeline passes.
        # The resolving action MUST be a full pass (resolve_funnel
        # docstring); resolve_funnel(verify=True) buys the exact-count
        # cross-check back for one extra pass
        funnel = []
        resolver = _build_funnel

    return CurationResult(
        documents=out,
        funnel=funnel,
        contamination_report=report,
        clusters=clusters,
        _funnel_resolver=resolver,
    )
