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

import contextlib
import contextvars
from typing import List, Optional

from pyspark.sql import DataFrame

_POOL: List[DataFrame] = []

#: When set (via :func:`scoped`), track() registers into this list
#: instead of the global pool.  A ContextVar is per-thread/per-context,
#: so a scope opened inside a Structured Streaming micro-batch thread
#: can never capture (or later unpersist) frames tracked by the main
#: thread or by a concurrently running second stream — the failure mode
#: a global release() inside foreachBatch had.
_ACTIVE: contextvars.ContextVar[Optional[List[DataFrame]]] = contextvars.ContextVar(
    "cachepool_active_scope", default=None
)


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next query
    boundary (or, inside a :func:`scoped` block, at scope exit).
    Returns the same DataFrame for chaining."""
    df.persist()
    scope = _ACTIVE.get()
    (_POOL if scope is None else scope).append(df)
    return df


def _release_list(pool: List[DataFrame]) -> int:
    n = 0
    while pool:
        df = pool.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session gone; the cache died with it
    return n


def release() -> int:
    """Unpersist every frame in the GLOBAL pool (non-blocking).
    Returns how many frames were released.  Scoped frames are not
    touched — they belong to their scope's exit.  Frames whose session
    has already stopped are dropped silently — there is nothing left
    to free."""
    return _release_list(_POOL)


@contextlib.contextmanager
def scoped():
    """Own the caches created inside the block: every ``track()`` call
    made within (in this thread/context) lands in a private pool that
    is released — and only it — when the block exits.

    This is the cache-ownership unit for concurrent work: a
    ``foreachBatch`` body runs on a streaming micro-batch thread, so a
    bare ``release()`` there would sweep the process-global pool and
    unpersist frames a concurrently running batch query (or second
    stream) is mid-way through reading.  ``with cachepool.scoped():``
    confines the sweep to the batch's own frames.
    """
    pool: List[DataFrame] = []
    token = _ACTIVE.set(pool)
    try:
        yield pool
    finally:
        _ACTIVE.reset(token)
        _release_list(pool)
