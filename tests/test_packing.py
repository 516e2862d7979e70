"""Sequence packing invariants: complete coverage, budget never
exceeded, offsets contiguous per pack, determinism, FFD efficiency,
oversize quarantine."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pytest
from pyspark.sql import functions as F

from latex_ocr_spark.operators.packing import pack_sequences, pack_stats

BUDGET = 512


def _docs(spark, n=400, seed_mod=97):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"CAST(1 + (id * 37) % {seed_mod} + (id % 7) * 53 AS LONG) AS n_tokens",
    )


def test_packing_invariants(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, BUDGET, num_partitions=8)
    rows = packed.collect()
    assert len(rows) == 400 and all(r.pack_id is not None for r in rows)

    by_pack = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, members in by_pack.items():
        used = sum(r.n_tokens for r in members)
        assert used <= BUDGET, (pid, used)
        # offsets tile the pack contiguously from 0
        spans = sorted((r.pack_offset, r.pack_offset + r.n_tokens) for r in members)
        assert spans[0][0] == 0
        for (a0, a1), (b0, _b1) in zip(spans, spans[1:]):
            assert a1 == b0, (pid, spans)

    stats = {r.pack_id: r for r in pack_stats(packed, BUDGET).collect()}
    assert set(stats) == set(by_pack)
    # FFD bound: while >1 pack exists in a partition, average fill is
    # decent — assert a conservative global floor
    fills = [r.fill_ratio for r in stats.values()]
    assert sum(fills) / len(fills) > 0.6, fills


def test_packing_is_deterministic(spark):
    docs = _docs(spark)
    a = sorted(
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_sequences(docs, BUDGET, num_partitions=8).collect()
    )
    b = sorted(
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_sequences(docs, BUDGET, num_partitions=8).collect()
    )
    assert a == b


def test_packing_quarantines_oversize_rows(spark):
    docs = spark.createDataFrame(
        [(0, 100), (1, BUDGET + 1), (2, BUDGET), (3, 50)],
        "doc_id long, n_tokens long",
    )
    rows = {r.doc_id: r for r in pack_sequences(docs, BUDGET).collect()}
    assert rows[1].pack_id is None and "exceeds budget" in rows[1].pack_error
    assert rows[2].pack_id is not None  # exactly-at-budget fits
    assert all(rows[i].pack_error is None for i in (0, 2, 3))

    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_packing_plan_has_single_exchange(spark):
    docs = _docs(spark)
    plan = (
        pack_sequences(docs, BUDGET, num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # the range repartition, nothing else
