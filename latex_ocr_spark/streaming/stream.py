"""Streaming extraction: the batch pipeline behind a readStream.

The reference has no streaming (SURVEY.md §2.10); its closest idiom is
the incremental render-resume loop (render.py:160-167).  Extraction is
stateless per turn, so the streaming form needs no custom state store:
``readStream`` over the transcripts directory → the same
``extract_spans`` transformation inside ``foreachBatch`` → append sink,
with ``availableNow`` for catch-up runs and the checkpoint directory
carrying exactly-once file-source progress.  Stable ordering is a
writeback concern (W1 window) applied by readers, since a stream can
only append.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from latex_ocr_spark.sources.tables import TRANSCRIPTS_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    reader = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    idempotent: bool = True,
):
    """Continuously extract spans from transcript files as they land.

    foreachBatch keeps the exact batch operator (single code path for
    batch + streaming).  ``idempotent=True`` (default) writes each
    micro-batch as a batch_id-partitioned dynamic overwrite
    (streaming/sinks.py) so a replayed batch replaces its own output —
    exactly-once results; read back via ``sinks.read_stream_output``.
    ``idempotent=False`` keeps the plain append layout (at-least-once
    under batch replay; dedup on read by row identity).
    """
    from latex_ocr_spark.operators.extract import extract_spans
    from latex_ocr_spark.streaming.sinks import (
        assert_idempotent_layout,
        write_batch_idempotent,
    )

    if idempotent:
        assert_idempotent_layout(spark, output_dir)

    stream = read_transcript_stream(spark, input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spans = extract_spans(batch_df.select("conv_id", "turn_idx", "text"))
        if idempotent:
            write_batch_idempotent(spans, batch_id, output_dir)
        else:
            spans.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
