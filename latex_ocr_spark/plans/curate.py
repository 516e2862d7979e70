"""End-to-end corpus curation: the composed pipeline a training-data
user actually runs, built from this repo's individually oracle-checked
operators:

    [redaction]            (textstats.redact_text — optional scrub)
      → quality gates        (textstats.text_profile expressions)
      → exact dedup          (dedup.exact_duplicates, keep canonical)
      → near-dup clustering  (LSH+verify pairs by default — the scale
                              path — or capped exact Jaccard;
                              → duplicate_clusters, keep one
                              representative per cluster)
      → decontamination      (dedup.decontaminate vs an eval set)
      → [sampling]           (textstats.deterministic_sample — optional
                              global or per-stratum down-sample)
      → cluster-safe split   (textstats.cluster_safe_split — near-dups
                              can't straddle train/val)

Every stage is a DataFrame → DataFrame transform; intermediates that
feed both the funnel counts and the next stage are cachepool-tracked
so the whole run costs one pass per stage.  The funnel (docs in/out
per stage) is the curation run's primary observability artifact — a
stage that silently drops 90% of a corpus should be visible in one
table, not discovered downstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
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

    def funnel_dict(self) -> Dict[str, Tuple[int, int]]:
        return {s: (i, o) for s, i, o in self.funnel}

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
) -> CurationResult:
    """Run the full curation funnel; see module docstring.

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
    funnel: List[Tuple[str, int, int]] = []
    cur = docs.select(id_col, text_col)
    if redact:
        # row-preserving scrub BEFORE any text-derived signal, so
        # hashes/shingles/profiles see what training will see
        cur = TS.redact_text(cur, text_col=text_col, out_col=text_col)
    cur = cachepool.track(cur)
    n = cur.count()
    if redact:
        funnel.append(("redact", n, n))

    # 1. quality gates — one codegen'd projection, one filter
    prof = TS.text_profile(cur, text_col=text_col, id_col=id_col).select(
        F.col("id").alias(id_col), "n_tokens", "punct_ratio"
    )
    kept_ids = prof.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(id_col)
    cur2 = cachepool.track(cur.join(kept_ids, id_col, "left_semi"))
    n2 = cur2.count()
    funnel.append(("quality_gates", n, n2))

    # 2. exact dedup — keep the canonical (min id) of each text group;
    # remember every >1-group's membership so exact duplicates get
    # cluster rows too (without them, a dropped exact copy re-added
    # later would split-hash by its own id and could straddle its
    # canonical — the leakage the cluster-safe split exists to prevent)
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
    cur3 = cachepool.track(cur2.join(canonical, id_col, "left_semi"))
    n3 = cur3.count()
    funnel.append(("exact_dedup", n2, n3))

    # 3. near-dup clustering — keep one representative per cluster
    if near_dup_method == "lsh":
        raw_pairs = D.lsh_verified_pairs(
            cur3, threshold=dedup_threshold, num_hashes=num_hashes,
            band_size=band_size, text_col=text_col, id_col=id_col,
            ngram=ngram, max_bucket_size=max_bucket_size,
        )
    else:
        raw_pairs = D.jaccard_pairs(
            cur3, threshold=dedup_threshold, text_col=text_col, id_col=id_col,
            ngram=ngram, max_df=max_df if max_df is not None else 1000,
        )
    pairs = cachepool.track(raw_pairs)
    if not pairs.take(1):
        # empty frame typed from the data, not a hardcoded long schema
        # (string ids must survive the later split join)
        near_clusters = cur3.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
        ).limit(0)
        cur4 = cur3
    else:
        near_clusters = cachepool.track(D.duplicate_clusters(pairs))
        non_canonical = near_clusters.filter(
            F.col("id") != F.col("cluster_id")
        ).select(F.col("id").alias(id_col))
        cur4 = cachepool.track(
            cur3.join(F.broadcast(non_canonical), id_col, "left_anti")
        )
    n4 = cur4.count()
    funnel.append(("near_dup_clusters", n3, n4))

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
    clusters = (
        near_clusters.unionByName(exact_resolved)
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    # 4. decontamination vs the eval set
    report = None
    cur5 = cur4
    if evalset is not None:
        report, cur5 = D.decontaminate(
            cur4, evalset, threshold=dedup_threshold,
            ngram=max(ngram, 1), text_col=text_col, id_col=id_col,
        )
        cur5 = cachepool.track(cur5)
    n5 = cur5.count()
    funnel.append(("decontaminate", n4, n5))

    # 5b. optional down-sample (deterministic, subset-stable)
    if sample_fraction is not None:
        cur5 = cachepool.track(
            TS.deterministic_sample(
                cur5, fraction=sample_fraction, id_col=id_col, seed=seed + ":sample"
            )
        )
        n5b = cur5.count()
        funnel.append(("sample", n5, n5b))
        n5 = n5b

    # 6. cluster-safe split (near-dups hash by their cluster canonical)
    out = TS.cluster_safe_split(
        cur5, clusters, val_fraction=val_fraction, id_col=id_col, seed=seed
    )
    funnel.append(("split", n5, n5))

    return CurationResult(
        documents=out,
        funnel=funnel,
        contamination_report=report,
        clusters=clusters,
    )
