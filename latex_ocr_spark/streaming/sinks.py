"""Idempotent foreachBatch sinks.

Structured Streaming's checkpoint gives exactly-once *source* progress,
but a plain ``mode("append")`` inside ``foreachBatch`` makes the OUTPUT
at-least-once: a batch that fails after (or between) its writes is
replayed on restart and appends its rows again.

The fix is the batch-id-partitioned dynamic overwrite: every batch
writes ``batch_id=<id>/`` partition directories with per-write
``partitionOverwriteMode=dynamic``, so a replayed batch REPLACES its
own partitions instead of appending next to them — the same
idempotent-unit commit the extraction resume path uses
(operators/lineage.py: dynamic overwrite by work_key).  Replays become
invisible; no dedup-on-read required.

For sinks that must stay plain appends (an external table whose layout
a consumer owns), :func:`dedup_on_read` is the documented read-side
escape hatch: both of this repo's streaming outputs carry natural keys
(report on (corpus_id, eval_id); cleaned/spans on their row identity),
so a keyed ``dropDuplicates`` removes replay copies.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "batch_id"


def assert_idempotent_layout(spark: SparkSession, path: str) -> None:
    """Refuse to mix the batch_id-partitioned layout into a PRE-EXISTING
    plain-append sink directory: root-level part files next to
    ``batch_id=N/`` partition dirs make the next read fail partition
    discovery ("conflicting directory structures").  Streams call this
    once at start — a legacy deployment keeps working by passing
    ``idempotent=False``, or migrates by moving the old files under a
    ``batch_id=-1/`` directory."""
    try:
        cols = spark.read.parquet(path).columns
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return  # fresh sink — fine
        raise
    if BATCH_COL not in cols:
        raise RuntimeError(
            f"output at {path} holds a plain-append (pre-idempotent) "
            f"layout without a {BATCH_COL} partition column; writing "
            "batch_id-partitioned data next to it would break partition "
            "discovery on read.  Pass idempotent=False to keep the "
            f"legacy layout, or move the existing files under "
            f"{path}/{BATCH_COL}=-1/ to migrate"
        )


def write_batch_idempotent(df: DataFrame, batch_id: int, path: str) -> None:
    """Write one micro-batch's rows under ``path`` so that replaying
    the batch replaces — never duplicates — its output.

    The overwrite mode rides the WRITER (a per-write option), not the
    session conf: foreachBatch runs on the stream's micro-batch thread
    and a session-wide conf flip there would race a concurrently
    committing second stream or batch query."""
    (
        df.withColumn(BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(path)
    )


def read_stream_output(spark: SparkSession, path: str) -> DataFrame:
    """Read an idempotent sink back without its transport column."""
    return spark.read.parquet(path).drop(BATCH_COL)


def dedup_on_read(
    spark: SparkSession, path: str, key_cols: Sequence[str]
) -> DataFrame:
    """Exactly-once view over a plain-append (at-least-once) sink:
    one row per natural key, replay copies dropped."""
    return spark.read.parquet(path).dropDuplicates(list(key_cols))
