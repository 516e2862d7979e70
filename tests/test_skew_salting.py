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


def _skewed_fact(spark, n_whale=200_000, n_keys=50):
    """One whale key carrying n_whale rows; the rest tiny."""
    whale = spark.range(n_whale).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    rest = spark.range(n_keys * 20).select(
        (F.col("id") % n_keys + 1).cast("long").alias("k"), F.col("id").alias("v")
    )
    return whale.unionByName(rest)


def test_aqe_skew_split_engages_on_whale_key_join(spark):
    """The J1-class equi-join under skew: with broadcast off (the
    regime where the dim no longer fits) AQE must split the whale
    partition at runtime — asserted via the final adaptive plan's
    skew marker, not prose.  Thresholds are scaled to the fixture the
    same way the defaults are scaled to production partitions."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        fact = _skewed_fact(spark)
        dim = spark.range(51).select(
            F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
        )
        joined = fact.join(dim, "k")
        # materialize THIS DataFrame's execution (count() would plan a
        # separate query and leave this one's adaptive plan non-final)
        assert len(joined.collect()) == 201_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE skew split did not engage:\n" + plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_equi_join_matches_plain_and_spreads_whale(spark):
    """The explicit-salt fallback: result identical to the plain join,
    whale rows spread across many shuffle partitions."""
    from latex_ocr_spark.operators.joins import salted_equi_join

    fact = _skewed_fact(spark, n_whale=20_000, n_keys=20)
    dim = spark.range(21).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    salted = salted_equi_join(fact, dim, on="k", salt=16)
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count()
    assert (
        salted.unionByName(plain).groupBy("k", "v", "name").count()
        .filter(F.col("count") != 2).count() == 0
    )  # exact multiset equality

    spread = (
        salted.filter(F.col("k") == 0)
        .withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert spread > 1, "whale key still pinned to one partition"


def test_salted_join_scatters_byte_identical_duplicate_rows(spark):
    """The whale shape a dedup corpus actually has: the hot key's rows
    are exact copies.  A salt hashed from row VALUES alone would send
    them all to one sub-key and re-pin the partition — the per-row id
    term in the salt must scatter them (review finding r3)."""
    from latex_ocr_spark.operators.joins import _SALT, salted_equi_join

    dup_fact = (
        spark.range(20_000)
        .select(F.lit(0).alias("k"), F.lit("same-bytes").alias("v"))
        .repartition(8)
    )
    dim = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = salted_equi_join(dup_fact, dim, on="k", salt=16)
    assert out.count() == 20_000

    # mechanism: recompute the internal salt the same way and assert
    # the identical rows disperse over many sub-keys
    n_subkeys = (
        dup_fact.select(
            F.pmod(
                F.xxhash64("k", "v", F.monotonically_increasing_id()), F.lit(16)
            ).alias(_SALT)
        )
        .distinct()
        .count()
    )
    assert n_subkeys == 16, f"duplicate rows collapsed to {n_subkeys} sub-keys"


def test_salted_left_join_keeps_unmatched_probe_rows(spark):
    from latex_ocr_spark.operators.joins import salted_equi_join

    probe = spark.range(10).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    build = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = salted_equi_join(probe, build, on="k", salt=4, how="left").collect()
    assert len(out) == 10
    assert all((r.k == 0) == (r.name == "zero") for r in out)


def test_salted_join_equals_plain_join_property(spark):
    """Property: over randomized skew shapes, salted inner/left joins
    are multiset-equal to the plain join (salt affects distribution
    only, never the result)."""
    import random

    rng = random.Random(7)
    from latex_ocr_spark.operators.joins import salted_equi_join

    for trial in range(3):
        n_keys = rng.randint(1, 6)
        rows = [
            (rng.randrange(n_keys + 2), rng.randrange(1000))  # some keys miss the dim
            for _ in range(rng.randint(50, 300))
        ]
        probe = spark.createDataFrame(rows, "k long, v long")
        dim = spark.createDataFrame(
            [(k, f"n{k}") for k in range(n_keys)], "k long, name string"
        )
        for how in ("inner", "left"):
            salted = salted_equi_join(probe, dim, on="k", salt=rng.choice([2, 8, 32]), how=how)
            plain = probe.join(dim, "k", how)
            # sorted-tuple multiset comparison (a join on the name
            # column would be null-UNsafe and miss the left join's
            # legitimate NULL-name groups)
            s = sorted(map(tuple, salted.collect()))
            p = sorted(map(tuple, plain.collect()))
            assert s == p, (trial, how)
