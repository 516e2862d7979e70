"""Distributed global id assignment — W6 line numbering at scale.

``row_number() OVER (ORDER BY …)`` funnels the whole dataset through a
single-partition window; at 100 TB that one task is the job.  This
module assigns the same contiguous 1..N ids with no global exchange:

1. range-repartition on the order keys (range partitions are emitted
   in key order, so partition i holds strictly smaller keys than
   partition i+1; equal keys never straddle a boundary);
2. per-partition local ``row_number`` — a window over
   ``spark_partition_id()``, which is as parallel as the data;
3. per-partition row counts (one tiny row per partition) are collected
   to the driver, turned into exclusive prefix-sum offsets, and mapped
   back as a literal — ``id = offset[pid] + local_row_number``.

The only driver-side data is one count per partition (a few KB at any
scale); everything row-sized stays distributed.  Output is bit-equal
to the global-window form whenever the order keys are unique.
"""

from __future__ import annotations

from itertools import accumulate
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from latex_ocr_spark import cachepool

_PID = "__gid_pid"
_LOCAL = "__gid_local"


def with_global_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "eq_id",
    start: int = 1,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Append a contiguous global id ordered by ``order_cols``.

    The intermediate range-partitioned frame is persisted because two
    passes read it (the counts collect and the final projection) and
    because partition *membership* must be identical in both — range
    boundaries come from order-sensitive reservoir sampling, so a
    recomputation after unpersist could reshuffle rows across pids and
    desynchronize ids from offsets.  The persist is registered with
    :mod:`latex_ocr_spark.cachepool`: it stays pinned until the NEXT
    query boundary (after this query's result is consumed), then the
    pool releases it — caches no longer accumulate across a many-query
    session.
    """
    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = cachepool.track(ranged.withColumn(_PID, F.spark_partition_id()))
    counts = dict(
        (r[_PID], r["n"])
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    if not counts:
        return ranged.drop(_PID).withColumn(id_col, F.lit(None).cast("long"))
    pids = sorted(counts)
    offsets = dict(zip(pids, accumulate([start] + [counts[p] for p in pids[:-1]])))
    offset_map = F.create_map(*[F.lit(x) for p in pids for x in (p, offsets[p])])
    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        ranged.withColumn(_LOCAL, F.row_number().over(w))
        .withColumn(
            id_col,
            (F.element_at(offset_map, F.col(_PID)) + F.col(_LOCAL) - 1).cast("long"),
        )
        .drop(_PID, _LOCAL)
    )
