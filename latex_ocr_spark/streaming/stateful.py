"""Custom stateful streaming operator: running per-conversation stats.

The engine's extraction is stateless per turn (SURVEY §2.10), so the
one place arbitrary state earns its keep is *conversation-level*
accumulation: as turns stream in, each conversation's running span
count / max turn index persists in the state store across micro-
batches and restarts.  Built on ``applyInPandasWithState`` — the
custom-stateful-operator escape hatch when windows can't express the
aggregation.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from latex_ocr_spark.sources.tables import TRANSCRIPTS_SCHEMA

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)


def _accumulate(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from latex_ocr_spark.textkernel.pipeline import extract_turn

    n_turns, n_spans, max_turn = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n_turns += len(pdf)
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        for text in pdf["text"]:
            n_spans += len(extract_turn(text if text is not None else ""))
    state.update((n_turns, n_spans, max_turn))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_spans": [n_spans],
            "max_turn_idx": [max_turn],
        }
    )


def start_conversation_stats_stream(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
):
    """Stream transcripts → per-conversation running stats (update mode).

    Each micro-batch emits the refreshed totals for the conversations
    it touched; state survives across availableNow catch-up runs via
    the checkpoint."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).format("parquet").load(input_dir)
    )
    stats = stream.groupBy("conv_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, _bid: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        stats.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
