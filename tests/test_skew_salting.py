"""Skew mitigation: a whale conversation must not pin one partition.

The salted (hash(conv_id), bucket) repartition spreads a 5,000-turn
conversation across many partitions while keeping batches
bucket-uniform — the reference's size-bucket batching doubling as skew
handling (SURVEY §4)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pandas as pd
from pyspark.sql import functions as F

from latex_ocr_spark.operators.inference import infer_spans, with_token_bucket
from latex_ocr_spark.operators.tokenize import with_tokens

N_WHALE = 3000
N_OTHERS = 40


def _spans_df(spark):
    rows = [("conv-whale", i, f"w_{{{i}}}+x") for i in range(N_WHALE)]
    for c in range(N_OTHERS):
        rows.append((f"conv-{c:04d}", 0, f"y_{{{c}}}"))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "latex_norm"])
    return spark.createDataFrame(pdf)


def test_salting_breaks_whale_conversation(spark):
    toked = with_tokens(_spans_df(spark))
    pred = infer_spans(toked, num_partitions=16, salt_buckets=64)
    sizes = (
        pred.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("conv_id") == "conv-whale", 1).otherwise(0)).alias("whale"),
        )
        .collect()
    )
    whale_parts = [r for r in sizes if r.whale > 0]
    # the whale spreads over many partitions, not one
    assert len(whale_parts) >= 8, f"whale pinned to {len(whale_parts)} partitions"
    assert max(r.n for r in sizes) < N_WHALE  # no single straggler holds it all
    # correctness unaffected by the shuffle
    assert pred.filter(F.col("pred_latex") != F.col("latex_norm")).count() == 0


def test_unsalted_whale_would_pin(spark):
    """Control: partitioning by conv_id alone pins the whale — the
    pathology the salt exists to break."""
    toked = with_token_bucket(with_tokens(_spans_df(spark)))
    plain = toked.repartition(16, F.col("conv_id"))
    sizes = (
        plain.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) >= N_WHALE
