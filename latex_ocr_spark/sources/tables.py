"""Readers for the driver-provided parquet tables and the synthetic
transcripts source.

Transcript synthesis is fully distributed: conversation ids are dealt
across executors with ``spark.range`` and each executor materializes
its conversations independently (every field of a row is a pure
function of (conv, turn) — see datagen.transcripts).  At 10¹²-turn
scale the same pattern applies with a larger range; no driver-side
materialization ever happens.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("raw_match", T.StringType(), False),
        T.StructField("latex_norm", T.StringType(), False),
    ]
)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    for name in TESTDATA_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def synth_transcripts(
    spark: SparkSession, n_convs: int, parallelism: Optional[int] = None
) -> DataFrame:
    """Distributed deterministic transcript table with ``n_convs``
    conversations (seed-stable; see FIXTURES.md §1)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the task so executors resolve the module themselves
        from latex_ocr_spark.datagen.transcripts import conv_length, make_turn

        cols = [f.name for f in TRANSCRIPTS_SCHEMA.fields]
        for pdf in batches:
            rows = [
                make_turn(int(conv), turn)
                for conv in pdf["id"]
                for turn in range(conv_length(int(conv)))
            ]
            yield pd.DataFrame(rows, columns=cols)

    convs = spark.range(n_convs)
    if parallelism:
        convs = convs.repartition(parallelism)
    return convs.mapInPandas(_gen, schema=TRANSCRIPTS_SCHEMA)
