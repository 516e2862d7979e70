"""Skew-aware equi-join strategies for whale keys.

The reference's load-bearing join (dataset.py:60: sample index →
equation row) is a key equi-join; at corpus scale a handful of whale
keys (one conversation with millions of turns, one boilerplate page
with millions of near-copies) pin single shuffle partitions and turn
the join into a straggler.

Two mitigations, in preference order:

1. **AQE skew split** (on by default, session.py): at runtime Spark
   splits an oversized shuffle partition and replicates the matching
   build-side rows — zero code, the right default.  It only engages
   for shuffled joins (sort-merge / shuffled-hash) past configured
   thresholds; tests/test_skew_salting.py demonstrates it firing on a
   whale-key join with the thresholds scaled to the fixture.
2. **Explicit salting** (:func:`salted_equi_join`): the static
   fallback when runtime re-planning is unavailable or the skew is
   known ahead of time — the probe side scatters each key over
   ``salt`` sub-keys, the build side is replicated ``salt`` times, and
   the join key becomes (key, salt).  Deterministic (the salt is a
   hash of the probe row, not an RNG), so retries and oracle
   comparisons are stable.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__join_salt"


def salted_equi_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    salt_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Equi-join with whale keys scattered over ``salt`` sub-keys.

    - ``probe`` (the large / skewed side) gets a salt in [0, salt):
      ``pmod(xxhash64(salt_cols, monotonically_increasing_id()))`` —
      the per-row id term keeps byte-identical rows (exact duplicates
      pre-dedup, precisely the whale shape a dedup corpus has) from
      all hashing to ONE sub-key and re-pinning the partition.  The
      salt value a given row gets is layout-dependent, but the join
      RESULT is salt-independent (every salt value meets a full build
      copy), so retries/oracles are unaffected;
    - ``build`` is replicated ``salt`` times (one copy per salt value)
      via a single ``explode`` — cost is salt × |build|, the standard
      trade: replication is linear, a pinned partition is not;
    - the shuffle key is (on, salt), so no partition receives more than
      ~1/salt of any key's rows.

    Result equals ``probe.join(build, on, how)`` row-for-row (the salt
    column is internal and dropped).  Inner and left joins only — a
    right/full join would need the salt on the other side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    cols = salt_cols or probe.columns
    salted_probe = probe.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in cols], F.monotonically_increasing_id()),
            F.lit(salt),
        ).cast("int"),
    )
    replicated_build = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_probe.join(replicated_build, [on, _SALT], how).drop(_SALT)
