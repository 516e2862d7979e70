"""Streaming deduplication — the exact-dedup operator (A2/I10) in
incremental form.

Two state-bounding strategies, both Spark-native:

- :func:`dedup_stream` — ``dropDuplicatesWithinWatermark`` on the text
  hash: a row is emitted once; re-arrivals inside the watermark window
  are dropped, and the state store evicts keys once the watermark
  passes (bounded state — the unbounded variant of dropDuplicates
  would grow forever at 100 TB/day ingest).
- :func:`dedup_stream_global` — plain ``dropDuplicates`` for finite
  backfills (availableNow catch-up over a bounded directory), where
  the full key set is the job's working set by definition.

Keying on ``md5(text)`` instead of the text itself keeps the state
store at ~32 bytes per key plus the event-time column — at 1 B
documents that's GBs, not TBs, of state.  128 bits, not 64: with 10⁹
distinct keys a 64-bit hash already has ~2.6% probability of at least
one collision, and a dedup-key collision silently *drops a unique
document*; at 128 bits the same figure is ~10⁻²⁰ (this mirrors the
batch exact-dedup operator, which keys on md5 for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    transcripts: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each text within the watermark horizon."""
    return (
        transcripts.withColumn("_text_key", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_key"])
        .drop("_text_key")
    )


def dedup_stream_global(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """Unbounded-state variant for finite catch-up runs."""
    return (
        transcripts.withColumn("_text_key", F.md5(F.col(text_col)))
        .dropDuplicates(["_text_key"])
        .drop("_text_key")
    )
