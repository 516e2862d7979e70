"""Per-partition lineage + metrics tables and checkpoint-resume.

Generalizes the reference's filesystem-as-state resume idiom
(render.py:47-53 re-derives the pending work list from already-written
outputs; arxiv.py:126-130 keeps a visited file) into Spark-native form:

- work is split into ``n_units`` deterministic units
  (``work_key = pmod(hash(conv_id), n_units)`` — whole conversations
  never straddle units, so per-conv ordering is local to one unit);
- the output table is partitioned by ``work_key`` and written with
  dynamic partition overwrite → re-running a unit is idempotent;
- after each unit batch commits, a lineage row (rows/spans/failures/
  wall time/order-independent checksum) is appended;
- resume = anti-join of the input's work keys against completed
  lineage keys (SURVEY.md §2.1 S8, §2.3 J3) — only missing units run.

Crash safety: output commits before lineage; a crash in between makes
the unit re-run (dynamic overwrite replaces its directory), never
duplicate or drop rows.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_UNITS = 64


def with_work_key(transcripts: DataFrame, n_units: int = DEFAULT_UNITS) -> DataFrame:
    return transcripts.withColumn(
        "work_key", F.pmod(F.hash("conv_id"), F.lit(n_units))
    )


def completed_units(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Work keys with a committed lineage row (empty DF when no runs yet)."""
    # probe via Spark, not os.path — the lineage table may live on
    # HDFS/S3 where the driver's local filesystem says nothing
    try:
        return spark.read.parquet(lineage_path).select("work_key").distinct()
    except Exception:  # AnalysisException: path does not exist
        return spark.createDataFrame([], "work_key int")


def pending_work(
    transcripts: DataFrame, spark: SparkSession, lineage_path: str, n_units: int = DEFAULT_UNITS
) -> DataFrame:
    keyed = with_work_key(transcripts, n_units)
    done = completed_units(spark, lineage_path)
    return keyed.join(F.broadcast(done), "work_key", "left_anti")


def _unit_checksum():
    """Order-independent content checksum per unit: XOR of row hashes.

    Survives any partitioning/ordering; two runs of the same unit match
    iff their row multisets match (xxhash64 collisions aside)."""
    return F.expr(
        "bit_xor(xxhash64(concat_ws('', conv_id, turn_idx, span_idx, raw_match, latex_norm)))"
    )


def run_resumable_extract(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    lineage_path: str,
    n_units: int = DEFAULT_UNITS,
    fail_on_units: Optional[set] = None,
) -> int:
    """Extract spans for all not-yet-completed units; return how many
    units were (re)processed.  ``fail_on_units`` injects a crash after
    the output commit of the listed units — test hook for the
    crash-between-commits window.

    Single-writer: holds a lease on the lineage dir for the run — two
    concurrent extract jobs would compute the same pending set, race
    dynamic overwrites of the same work_key directories, and append
    lineage rows describing each other's bytes (the same interleaving
    the funnel's CheckpointLease fences).  A second run fails loudly;
    a crashed run's lease auto-releases (flock).  Skipped for
    URI-scheme lineage paths, where the local-fs lease cannot see
    anything — see lease.py for the object-store note.  The lock file
    lives inside the lineage dir; Spark's parquet reader ignores
    underscore-prefixed files.
    """
    from contextlib import nullcontext

    from latex_ocr_spark import lease as lease_mod

    fence = (
        nullcontext()
        if lease_mod.is_uri_path(lineage_path)
        else lease_mod.DirLease(lineage_path, role="extract job")
    )
    with fence:
        return _run_resumable_extract_locked(
            spark, transcripts, output_path, lineage_path, n_units,
            fail_on_units,
        )


def _run_resumable_extract_locked(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    lineage_path: str,
    n_units: int,
    fail_on_units: Optional[set],
) -> int:
    from latex_ocr_spark.operators.extract import extract_spans_with_failures

    pending = pending_work(transcripts, spark, lineage_path, n_units)
    unit_rows = [r.work_key for r in pending.select("work_key").distinct().collect()]
    if not unit_rows:
        return 0

    prev_overwrite_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    started = time.time()
    raw_handle = None
    try:
        spans, failed, raw_handle = extract_spans_with_failures(
            pending.select("conv_id", "turn_idx", "text"), persist_raw=True
        )
        spans = with_work_key(spans, n_units)
        failed = with_work_key(failed, n_units)

        # 1. output commit — dynamic overwrite touches only pending units'
        # directories (completed units' data is never rewritten)
        spans.write.mode("overwrite").partitionBy("work_key").parquet(output_path)

        if fail_on_units and set(unit_rows) & set(fail_on_units):
            raise RuntimeError("injected crash between output and lineage commit")

        # 2. lineage commit (append) — marks the units done
        metrics = (
            spans.groupBy("work_key")
            .agg(
                F.countDistinct("conv_id", "turn_idx").alias("n_turns"),
                F.count(F.lit(1)).alias("n_spans"),
                _unit_checksum().alias("checksum"),
            )
            .join(
                failed.groupBy("work_key").agg(F.count(F.lit(1)).alias("n_failed")),
                "work_key",
                "left",
            )
            .na.fill({"n_failed": 0})
        )
        # units whose every turn yielded zero spans still need a lineage row
        all_pending = pending.select("work_key").distinct()
        metrics = (
            all_pending.join(metrics, "work_key", "left")
            .na.fill({"n_turns": 0, "n_spans": 0, "n_failed": 0, "checksum": 0})
            .withColumn("started", F.lit(int(started)).cast("long"))
            .withColumn("finished", F.lit(int(time.time())).cast("long"))
            .withColumn("attempt", F.lit(1))
        )
        metrics.write.mode("append").parquet(lineage_path)
    finally:
        # any failure path must not leak the dynamic overwrite mode
        # session-wide nor leave the raw extraction frame cached
        if raw_handle is not None:
            raw_handle.unpersist()
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_overwrite_mode
        )
    return len(unit_rows)


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(output_path)
