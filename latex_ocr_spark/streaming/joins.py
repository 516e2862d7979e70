"""Stream-stream interval join — attach right-stream events to
left-stream rows within an event-time window.

The pipeline shape: freshly extracted spans (left) joined to
engagement/feedback events (right) as both streams land.  Spark keeps
both sides in the state store; the join is only tractable unbounded
because BOTH sides carry watermarks AND the join condition bounds the
event-time range — that pair is what lets the store evict rows whose
match window has passed (without it, state grows forever at 100 TB/day
ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    within: str = "30 minutes",
) -> DataFrame:
    """Inner join: right rows with the same ``key`` whose timestamp
    falls in ``[left_ts, left_ts + within]``.

    Right-side columns are suffixed ``_r`` where they collide.  Works
    identically over batch frames (no watermark needed there) — the
    streaming test pins the two equal.
    """
    l = left.alias("l").withWatermark(left_ts, watermark) if left.isStreaming else left.alias("l")
    r = (
        right.alias("r").withWatermark(right_ts, watermark)
        if right.isStreaming
        else right.alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    joined = l.join(r, cond, "inner")
    out_cols = [F.col(f"l.{c}") for c in left.columns]
    for c in right.columns:
        if c == key:
            continue
        name = f"{c}_r" if c in left.columns else c
        out_cols.append(F.col(f"r.{c}").alias(name))
    return joined.select(*out_cols)
