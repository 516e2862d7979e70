"""Query-scoped ownership for persisted DataFrames.

Several operators persist an intermediate frame that multiple branches
of ONE query's plan re-read (dedup's shingle frame feeds signatures /
candidates / verify; tf-idf's tf frame feeds both the join and the df
aggregate; the global-id frame must stay pinned so its collected
per-partition counts can't desync from a recomputed shuffle).  Those
caches are correct *within* the query but — left alone — accumulate
across a many-query session: the driver harness, bench.py, and the
test suite all run dozens of queries back-to-back, and round 2's bench
showed earlier queries' caches evicting later ones (the 3× wall-time
noise on dedup_lsh_jaccard).

The ownership rule: **a persisted frame belongs to the query that
created it, and the next query boundary releases it.**

- operators call :func:`track` instead of bare ``persist()``;
- ``__spark_entry__.queries()`` wrappers call :func:`release` before
  each query, so a driver/bench/test loop holds at most one query's
  caches at a time — with no change to the driver-facing API;
- anything that wants an explicit end-of-session sweep calls
  :func:`release` directly (bench.py does, between timed queries, so
  a timing never includes another query's cache pressure).

Releasing at the *next* boundary (not eagerly at return) is what makes
the pattern safe for frames like the global-id one whose correctness
depends on staying pinned until the query's result has been consumed:
by the time the next query starts, the previous result was collected.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_POOL: List[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next query
    boundary.  Returns the same DataFrame for chaining."""
    df.persist()
    _POOL.append(df)
    return df


def release() -> int:
    """Unpersist every tracked frame (non-blocking).  Returns how many
    frames were released.  Frames whose session has already stopped
    are dropped silently — there is nothing left to free."""
    n = 0
    while _POOL:
        df = _POOL.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session gone; the cache died with it
    return n
