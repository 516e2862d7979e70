"""Checkpoint-resumable curation funnel.

Extends the extraction resume idiom (operators/lineage.py — the
reference's filesystem-as-state pattern, render.py:47-53 /
arxiv.py:126-130) to the multi-stage curation pipeline: at 100 TB a
funnel that dies during decontamination must NOT restart from the
corpus scan.

Design — persist the *small derived* frames, never the corpus:

    stage      artifact (parquet)                        size class
    ---------  ----------------------------------------  ----------
    groups     exact-dup groups (hash, canonical, count)  ~#distinct texts, narrow
    pairs      verified near-dup pairs (a_id, b_id, j)    ~dup pairs
    clusters   merged duplicate clusters (id, cluster)    ~docs in dup groups
    report     contamination report (corpus, eval, j)     ~contaminated docs
    documents  final curated table with split column      the real sink

The corpus-side survivor frames are always RE-DERIVED lazily from the
immutable input by joining against these artifacts (a pruned scan +
filter + semi/anti-join — cheaper at scale than writing and re-reading
corpus text at every boundary, and identical to plans/curate.py's
no-corpus-persist design).  Each stage commits artifact-then-lineage:
a crash between the two re-runs that one stage (artifact overwrite is
idempotent), never duplicates or drops rows — the same crash-window
contract run_resumable_extract proves in tests/test_lineage_resume.py.

Resume = skip every stage with a committed lineage row whose config
fingerprint matches; a fingerprint mismatch raises rather than
silently mixing artifacts computed under different knobs.

Funnel counts cost zero corpus passes here too: the gate counts ride
``observe()`` on the groups stage's write, post-exact survivors equal
the groups artifact's row count, near-dup/contamination drops are
counted on the small artifacts at commit time, and the final count
rides the documents write.  The assembled funnel is pinned equal to
plans/curate.py's in tests/test_curate_resume.py.

Trade-off vs the single-pass funnel: a FRESH resumable run that
executes pairs + report in one invocation still shares the one corpus
shingle explode (the in-memory frames are forwarded exactly as
curate.py does); a RESUMED run re-derives what it needs from the
artifacts instead.  What resumable mode adds is the stage-boundary
writes — the price of durability, chosen by passing a checkpoint dir.
"""

from __future__ import annotations

import hashlib
import json
import time
from typing import Callable, List, Optional, Set, Tuple

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from latex_ocr_spark import cachepool
from latex_ocr_spark.lease import DirLease
from latex_ocr_spark.operators import dedup as D
from latex_ocr_spark.operators import textstats as TS
from latex_ocr_spark.plans.curate import CurationResult, _count

_LINEAGE_SCHEMA = (
    "stage string, config_hash string, n_rows long, meta string, "
    "started long, finished long"
)

#: stage execution order (report only runs when an eval set is given)
STAGES = ("groups", "pairs", "clusters", "report", "documents")


def _obs_n(obs: Observation, fallback: Callable[[], int]) -> int:
    """Observation count with the degenerate-corpus fallback
    plans/curate.py carries: when a runtime-empty broadcast side makes
    AQE skip the branch holding a CollectMetrics node, the observation
    completes with a schema-less empty row that pyspark's
    ``Observation.get`` cannot convert (toPyRow asserts).  Read the JVM
    map directly; when the metric is genuinely absent, pay the
    caller's fallback count — only on this near-empty path, where the
    funnel MUST still report true stage counts."""
    try:
        return int(obs.get["n"])
    except Exception:
        try:
            m = obs._jo.getAsJava()
            if m.containsKey("n"):
                return int(m.get("n"))
        except Exception:
            pass
        return int(fallback())


def _config_hash(knobs: dict) -> str:
    return hashlib.md5(
        json.dumps(knobs, sort_keys=True, default=str).encode()
    ).hexdigest()


class CheckpointLease(DirLease):
    """Single-writer fence for a resumable checkpoint dir.

    The artifact-then-lineage commit protocol assumes ONE writer; two
    concurrent runs on the same checkpoint could interleave an
    artifact overwrite from run A with a lineage append from run B,
    committing a lineage row that describes the other run's bytes.
    Mechanics live in :class:`latex_ocr_spark.lease.DirLease`, shared
    with the survivor-index fences: an ``flock`` on a lock file the
    kernel releases the instant the holding process dies — there is
    NO break step and no operator-deletable "stale" lock (lease.py
    documents why the old O_CREAT|O_EXCL + dead-owner-break design
    was unsafe); a second live holder is refused loudly with the
    holder's identity, and remote/URI checkpoint paths are rejected
    rather than silently unfenced.
    """

    def __init__(self, checkpoint_dir: str):
        super().__init__(checkpoint_dir, name="_lock", role="funnel")


def _read_lineage(spark: SparkSession, lineage_path: str) -> dict:
    """{stage: (config_hash, n_rows, meta_dict)} for committed stages,
    latest commit per stage winning (a re-run after a config change
    overwrites artifacts and appends fresh lineage)."""
    try:
        rows = spark.read.parquet(lineage_path).collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return {}  # no runs yet
        # any OTHER analysis failure (permissions, corrupt footer)
        # must NOT be read as "fresh checkpoint": that would silently
        # discard resume state and re-run a 100 TB funnel from the
        # scan — and bypass the config-mismatch refusal
        raise
    out = {}
    for r in sorted(rows, key=lambda r: (r["finished"], r["started"])):
        out[r["stage"]] = (r["config_hash"], r["n_rows"], json.loads(r["meta"]))
    return out


def _commit(
    spark: SparkSession,
    lineage_path: str,
    stage: str,
    cfg: str,
    n_rows: int,
    meta: dict,
    started: int,
) -> None:
    spark.createDataFrame(
        [(stage, cfg, n_rows, json.dumps(meta), started, int(time.time()))],
        _LINEAGE_SCHEMA,
    ).write.mode("append").parquet(lineage_path)


def curate_corpus_resumable(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_dir: str,
    evalset: Optional[DataFrame] = None,
    **knobs,
) -> CurationResult:
    """Single-writer entry point: hold the checkpoint lease for the
    whole run (see :class:`CheckpointLease` — concurrent writers on one
    checkpoint would interleave artifact/lineage commits), then run or
    resume the funnel.  All keyword knobs are those of
    :func:`_curate_resumable_impl`, the lease-free implementation.

    URI-scheme checkpoint dirs (``s3a://…``) skip the local-fs lease
    with the documented object-store note — same policy as
    run_resumable_extract; refusing outright would regress runs the
    pre-lease code allowed."""
    from contextlib import nullcontext

    from latex_ocr_spark.lease import is_uri_path

    fence = (
        nullcontext()
        if is_uri_path(checkpoint_dir)
        else CheckpointLease(checkpoint_dir.rstrip("/"))
    )
    with fence:
        return _curate_resumable_impl(spark, docs, checkpoint_dir, evalset, **knobs)


def _curate_resumable_impl(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_dir: str,
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
    assume_small_side_frames: bool = True,
    _fail_after_write: Optional[Set[str]] = None,
) -> CurationResult:
    """Run (or resume) the curation funnel with durable stage
    boundaries under ``checkpoint_dir``; same knobs and same output
    contract as :func:`plans.curate.curate_corpus`.

    ``_fail_after_write`` injects a crash after the artifact write but
    BEFORE the lineage commit of the named stages — the test hook for
    the crash window (mirrors run_resumable_extract's fail_on_units).
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

    cfg = _config_hash(
        dict(
            min_tokens=min_tokens, max_punct_ratio=max_punct_ratio,
            dedup_threshold=dedup_threshold, near_dup_method=near_dup_method,
            ngram=ngram, num_hashes=num_hashes, band_size=band_size,
            max_bucket_size=max_bucket_size, max_df=max_df, redact=redact,
            sample_fraction=sample_fraction, val_fraction=val_fraction,
            seed=seed, id_col=id_col, text_col=text_col,
            has_evalset=evalset is not None,
        )
    )
    ckpt = checkpoint_dir.rstrip("/")
    lineage_path = f"{ckpt}/_lineage"
    done = _read_lineage(spark, lineage_path)
    for stage, (stage_cfg, _n, _m) in done.items():
        if stage_cfg != cfg:
            raise RuntimeError(
                f"checkpoint at {ckpt} holds stage '{stage}' computed under a "
                f"different configuration ({stage_cfg[:8]}… vs {cfg[:8]}…) — "
                "resuming would mix artifacts across configs; use a fresh "
                "checkpoint dir (or delete this one) to change knobs"
            )
    fail_after = _fail_after_write or set()
    _maybe_bcast = F.broadcast if assume_small_side_frames else (lambda df: df)

    def _crash_if(stage: str) -> None:
        if stage in fail_after:
            raise RuntimeError(
                f"injected crash after '{stage}' artifact write, before lineage commit"
            )

    # corpus spine: redaction is row-preserving and must precede any
    # text-derived signal (hashes/shingles see what training sees)
    cur = docs.select(id_col, text_col)
    if redact:
        cur = TS.redact_text(cur, text_col=text_col, out_col=text_col)

    # ---- stage 1: exact-dup groups --------------------------------
    groups_path = f"{ckpt}/groups"
    if "groups" in done:
        n_in = done["groups"][2]["n_in"]
        n_q = done["groups"][2]["n_q"]
        n3 = done["groups"][1]
        groups = spark.read.parquet(groups_path)
    else:
        started = int(time.time())
        obs_in, obs_q = Observation(), Observation()
        gated = (
            TS.quality_gate(
                cur.observe(obs_in, _count("n")),
                min_tokens=min_tokens, max_punct_ratio=max_punct_ratio,
                text_col=text_col,
            )
            .filter(F.col(id_col).isNotNull())
            .observe(obs_q, _count("n"))
        )
        g_obs = Observation()
        D.exact_duplicates(gated, text_col=text_col, id_col=id_col).observe(
            g_obs, _count("n")
        ).write.mode("overwrite").parquet(groups_path)
        _crash_if("groups")
        n_in = _obs_n(obs_in, lambda: cur.count())
        n_q = _obs_n(
            obs_q,
            lambda: TS.quality_gate(
                cur, min_tokens=min_tokens, max_punct_ratio=max_punct_ratio,
                text_col=text_col,
            ).filter(F.col(id_col).isNotNull()).count(),
        )
        n3 = _obs_n(g_obs, lambda: spark.read.parquet(groups_path).count())
        _commit(spark, lineage_path, "groups", cfg, n3,
                {"n_in": n_in, "n_q": n_q}, started)
        groups = spark.read.parquet(groups_path)

    # gated survivors re-derived lazily (pruned scan + filter — never
    # checkpointed corpus text); exact-dedup survivors via the groups
    # artifact's canonical semi-join
    gated = TS.quality_gate(
        cur, min_tokens=min_tokens, max_punct_ratio=max_punct_ratio,
        text_col=text_col,
    ).filter(F.col(id_col).isNotNull())
    canonical = groups.select(F.col("canonical_id").alias(id_col))
    cur3 = gated.join(canonical, id_col, "left_semi")

    # ---- stage 2: verified near-dup pairs -------------------------
    pairs_path = f"{ckpt}/pairs"
    sh3 = arrs3 = sig3 = None  # in-memory reuse when computed THIS invocation
    if "pairs" in done:
        pairs = spark.read.parquet(pairs_path)
    else:
        started = int(time.time())
        if near_dup_method == "lsh":
            # row-wise shingle sets + signature projection — no explode,
            # no distinct exchange, no groupBy (see operators/dedup.py).
            # ONE cached profile frame (shingles + signatures + size):
            # stacked caches would re-run the corpus tokenize + hash
            # family once per layer inside a single action
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
                ngram=ngram, max_bucket_size=max_bucket_size,
                _arrs=arrs3, _signatures=sig3,
                assume_small_pairs=assume_small_side_frames,
            )
        else:
            sh3 = cachepool.track(
                D.doc_shingles(cur3, text_col=text_col, id_col=id_col, ngram=ngram)
            )
            raw_pairs = D.jaccard_pairs(
                cur3, threshold=dedup_threshold, text_col=text_col,
                id_col=id_col, ngram=ngram,
                max_df=max_df if max_df is not None else 1000,
                _shingles=sh3,
            )
        p_obs = Observation()
        raw_pairs.observe(p_obs, _count("n")).write.mode("overwrite").parquet(
            pairs_path
        )
        _crash_if("pairs")
        n_pairs = _obs_n(p_obs, lambda: spark.read.parquet(pairs_path).count())
        _commit(spark, lineage_path, "pairs", cfg, n_pairs, {}, started)
        pairs = spark.read.parquet(pairs_path)

    # ---- stage 3: duplicate clusters ------------------------------
    clusters_path = f"{ckpt}/clusters"
    if "clusters" in done:
        n_non_canonical = done["clusters"][2]["n_non_canonical"]
        clusters = spark.read.parquet(clusters_path)
    else:
        started = int(time.time())
        near_clusters = D.duplicate_clusters(pairs)
        # near-only non-canonical count: the docs the near-dup stage
        # drops from the spine (cheap — the loop already materialized
        # this frame via localCheckpoint)
        n_non_canonical = near_clusters.filter(
            F.col("id") != F.col("cluster_id")
        ).count()
        exact_members = (
            gated.select(
                F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash")
            )
            .join(
                groups.filter(F.col("dup_count") > 1).select(
                    "text_hash", "canonical_id"
                ),
                "text_hash",
            )
            .select("id", "canonical_id")
        )
        exact_resolved = (
            exact_members.join(
                near_clusters.select(
                    F.col("id").alias("canonical_id"),
                    F.col("cluster_id").alias("_near_cl"),
                ),
                "canonical_id",
                "left",
            )
            .select("id", F.coalesce("_near_cl", "canonical_id").alias("cluster_id"))
        )
        near_clusters.unionByName(exact_resolved).groupBy("id").agg(
            F.min("cluster_id").alias("cluster_id")
        ).write.mode("overwrite").parquet(clusters_path)
        _crash_if("clusters")
        _commit(spark, lineage_path, "clusters", cfg, -1,
                {"n_non_canonical": n_non_canonical}, started)
        clusters = spark.read.parquet(clusters_path)
    n4 = n3 - n_non_canonical

    # near-dup survivors: anti-join against the merged artifact's
    # id != cluster_id rows.  For rows still on the spine (cur3) this
    # set equals the near-only non-canonical set exactly — exact-dup
    # members with id != cluster_id left the spine at the canonical
    # semi-join, and an exact canonical that joined a near cluster it
    # doesn't name appears in the near component itself
    non_canonical = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    cur4 = cur3.join(_maybe_bcast(non_canonical), id_col, "left_anti")

    # ---- stage 4: decontamination report --------------------------
    report_path = f"{ckpt}/report"
    report = None
    cur5 = cur4
    n5 = n4
    if evalset is not None:
        if "report" in done:
            n5 = n4 - done["report"][2]["n_dropped"]
            report = spark.read.parquet(report_path)
        else:
            started = int(time.time())
            sh4 = arrs4 = sig4 = None
            if sh3 is not None or arrs3 is not None:
                # pairs ran this invocation: reuse the one corpus
                # shingling, survivor-filtered (exact same filter
                # plans/curate.py applies)
                dropped = _maybe_bcast(non_canonical.withColumnRenamed(id_col, "id"))
                if sh3 is not None:
                    sh4 = sh3.join(dropped, "id", "left_anti")
                if arrs3 is not None:
                    arrs4 = arrs3.join(dropped, "id", "left_anti")
                if sig3 is not None:
                    sig4 = sig3.join(dropped, "id", "left_anti")
            fresh_report, _cleaned = D.decontaminate(
                cur4, evalset, threshold=dedup_threshold,
                num_hashes=num_hashes, band_size=band_size, ngram=ngram,
                text_col=text_col, id_col=id_col,
                max_bucket_size=max_bucket_size,
                _corpus_shingles=sh4, _corpus_arrs=arrs4,
                _corpus_signatures=sig4,
                contaminated_is_small=assume_small_side_frames,
            )
            fresh_report.write.mode("overwrite").parquet(report_path)
            _crash_if("report")
            report = spark.read.parquet(report_path)
            # every contaminated id is on the cur4 spine by
            # construction, so the stage's drop count is a distinct
            # count over the SMALL artifact — no corpus pass (and one
            # action: rows + distinct ride the same aggregate)
            n_rows, n_dropped = report.agg(
                F.count(F.lit(1)), F.count_distinct("corpus_id")
            ).first()
            n5 = n4 - int(n_dropped)
            _commit(spark, lineage_path, "report", cfg,
                    int(n_rows), {"n_dropped": int(n_dropped)}, started)
        contaminated = _maybe_bcast(
            report.select(F.col("corpus_id").alias(id_col)).distinct()
        )
        cur5 = cur4.join(contaminated, id_col, "left_anti")

    # ---- stage 5: sample, split, final write ----------------------
    if sample_fraction is not None:
        cur5 = TS.deterministic_sample(
            cur5, fraction=sample_fraction, id_col=id_col, seed=seed + ":sample"
        )
    out = TS.cluster_safe_split(
        cur5, clusters, val_fraction=val_fraction, id_col=id_col, seed=seed,
        clusters_are_small=assume_small_side_frames,
    )
    docs_path = f"{ckpt}/documents"
    if "documents" in done:
        n_final = done["documents"][1]
    else:
        started = int(time.time())
        f_obs = Observation()
        out.observe(f_obs, _count("n")).write.mode("overwrite").parquet(docs_path)
        _crash_if("documents")
        n_final = _obs_n(f_obs, lambda: spark.read.parquet(docs_path).count())
        if sample_fraction is None and n_final != n5:
            raise RuntimeError(
                f"funnel metrics anomaly: artifact-derived post-"
                f"decontamination count {n5} != written final count "
                f"{n_final} (stale artifacts? metrics double-applied?)"
            )
        _commit(spark, lineage_path, "documents", cfg, n_final, {}, started)

    funnel: List[Tuple[str, int, int]] = []
    if redact:
        funnel.append(("redact", n_in, n_in))
    funnel.append(("quality_gates", n_in, n_q))
    funnel.append(("exact_dedup", n_q, n3))
    funnel.append(("near_dup_clusters", n3, n4))
    # always present (n5 == n4 without an eval set), matching
    # plans/curate.py's funnel shape exactly
    funnel.append(("decontaminate", n4, n5))
    if sample_fraction is not None:
        funnel.append(("sample", n5, n_final))
        n5 = n_final
    funnel.append(("split", n5, n_final))

    return CurationResult(
        documents=spark.read.parquet(docs_path),
        funnel=funnel,
        contamination_report=report,
        clusters=clusters,
    )
