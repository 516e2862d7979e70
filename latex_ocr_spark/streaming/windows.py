"""Event-time windowed aggregation with watermarking.

The reference is batch-only (SURVEY §2.10); this is the engine's
streaming form of the A-family rollups: tumbling event-time windows
over a growing events table, a watermark bounding state for late data,
append output so each window emits exactly once — when the watermark
passes its end.  The batch equivalent (registry ``w7_event_time
_windows``) is the DuckDB-oracled semantic contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def start_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
):
    """File-source → watermarked tumbling windows → append parquet.

    Append mode means a window row is written exactly once, after the
    watermark passes its close — the exactly-once contract downstream
    consumers rely on; still-open windows live in the state store
    across restarts (checkpoint_dir)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(input_dir)
    agg = windowed_counts(stream, window, watermark)
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_counts(
    events: DataFrame, gap: str = "17 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based per-user session aggregation — Spark's native
    session_window; in streaming the state store merges/extends open
    sessions and the watermark closes them exactly once (batch form +
    DuckDB gaps-and-islands oracle: registry ``w8_session_windows``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def start_session_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "17 minutes",
    watermark: str = "1 hour",
):
    """File-source → watermarked session windows → append parquet."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(input_dir)
    agg = session_counts(stream, gap, watermark)
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
