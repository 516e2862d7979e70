"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of the J1-family joins is the shuffle of
the fact side.  Writing both sides bucketed (and sorted) on the join
key moves that shuffle to write time — every subsequent join on the
key is exchange-free: Spark matches bucket i of one table to bucket i
of the other (``spark.sql.sources.bucketing.enabled``, on by default).

This is the storage-layout half of the skew/shuffle strategy
(SURVEY.md §4); the runtime half (salting + AQE) lives in
operators/extract.py.  tests/test_bucketed_join.py asserts the plan:
no ``Exchange hashpartitioning`` on either side of the join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets upgrades the join to a zero-sort
    sort-merge: with both sides bucketed+sorted on the key, the join
    stage is a pure streaming merge of co-numbered buckets.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, keys[0], *keys[1:]
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    The merge hint pins the strategy that exploits bucketing — an
    auto-broadcast of a small side would hide the exchange-free plan
    this layout exists to produce (at real scale neither side
    broadcasts anyway)."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).hint("merge").join(spark.table(right_table), keys)
