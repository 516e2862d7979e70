"""Sequence packing: greedy first-fit-decreasing assignment of
documents into fixed token budgets — the training-efficiency step after
tokenization (padding waste ∝ 1 - fill ratio; packing several short
sequences into one budget recovers it).  Complements the reference's
size-bucket batching (dataset.py:70-79 / operators/inference.py): that
groups SAME-shaped rows for tensor uniformity, this fills a FIXED
budget with mixed lengths.

Spark shape:

- one range-repartition on the id (so pack membership is deterministic
  and retry-stable), then a per-partition sort by (tokens desc, id) —
  first-fit-decreasing order;
- packing runs inside ``mapInPandas`` with bin state carried across
  the partition's Arrow batches: packs NEVER span partitions, so an
  executor can materialize whole packs locally and the only shuffle in
  the plan is the one repartition;
- ``pack_id = partition_id * 2^32 + local_pack`` — globally unique
  without any coordination;
- rows larger than the budget are quarantined (``pack_id`` NULL +
  ``pack_error``), never silently truncated.

Packing quality: FFD fills each bin to ≥ 50% of budget whenever any
unpacked row fits (classic bound); per-partition packing costs one
extra pack per partition at worst versus a global pack — at corpus
scale that waste is ~partitions/packs → 0, and global packing would
need a single-partition pass (the exact pathology this repo's id
assignment avoids).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Append (pack_id, pack_offset, pack_error) to ``docs``.

    ``pack_offset`` is the row's token start inside its pack (rows are
    laid out in assignment order).  Deterministic: same input ⇒ same
    packs, on any cluster size with the same ``num_partitions``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    schema = T.StructType(
        list(docs.schema.fields)
        + [
            T.StructField("pack_id", T.LongType(), True),
            T.StructField("pack_offset", T.LongType(), True),
            T.StructField("pack_error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bin state spans the partition's Arrow batches: packs are
        # partition-scoped, batches are an Arrow transport detail
        pid = None
        bins: list[list[int]] = []  # bins[k] = [used_tokens]
        for pdf in batches:
            if pid is None and len(pdf):
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
            pack_ids, offsets, errors = [], [], []
            for tok in pdf[n_tokens_col]:
                tok = int(tok)
                if tok > budget:
                    pack_ids.append(None)
                    offsets.append(None)
                    errors.append(f"row exceeds budget ({tok} > {budget})")
                    continue
                # first fit (input arrives sorted decreasing)
                for k, used in enumerate(bins):
                    if used[0] + tok <= budget:
                        pack_ids.append((pid << 32) | k)
                        offsets.append(used[0])
                        used[0] += tok
                        break
                else:
                    bins.append([tok])
                    pack_ids.append((pid << 32) | (len(bins) - 1))
                    offsets.append(0)
                errors.append(None)
            out = pdf.copy()
            out["pack_id"] = pd.Series(pack_ids, dtype="Int64")
            out["pack_offset"] = pd.Series(offsets, dtype="Int64")
            out["pack_error"] = errors
            yield out

    ranged = (
        docs.repartitionByRange(num_partitions, F.col(id_col))
        if num_partitions
        else docs.repartitionByRange(F.col(id_col))
    )
    ordered = ranged.sortWithinPartitions(F.col(n_tokens_col).desc(), F.col(id_col))
    return ordered.mapInPandas(run, schema=schema)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One row per pack: n_rows, used tokens, fill ratio — the
    padding-waste report a training job reads before deciding budget."""
    return (
        packed.filter(F.col("pack_id").isNotNull())
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").alias("used_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("used_tokens") / budget, 4))
    )
