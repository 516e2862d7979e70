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

    The intermediate range-partitioned frame is read by two passes
    (the counts collect and the final projection) whose partition
    *membership* must be identical — range boundaries come from
    reservoir sampling, which is order-sensitive.  Two belts make
    that hold:

    - the input is ``sortWithinPartitions(order_cols)`` first (a local
      sort, no shuffle), so each partition feeds the sampler a
      deterministic row sequence — RangePartitioner's sampler is
      seeded by partition id, so the boundaries (and therefore pid
      membership) are then a pure function of the data and any
      recomputation reproduces them bit-for-bit, even if the input
      arrived through a shuffle whose fetch order varies per run;
    - the frame is persisted (``cachepool.track``) so the common
      sequential path never recomputes at all; the pool releases it at
      the next query boundary.  With the determinism belt above, a
      consumer that collects this result *after* a later query started
      (deferred consumption) recomputes identical ids instead of
      silently desyncing.
    """
    cols = [F.col(c) for c in order_cols]
    stable = df.sortWithinPartitions(*cols)
    if num_partitions:
        ranged = stable.repartitionByRange(num_partitions, *cols)
    else:
        ranged = stable.repartitionByRange(*cols)
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
