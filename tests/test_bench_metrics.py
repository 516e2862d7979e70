"""The bench plan-cost collector is the cross-round regression signal —
its parsing must be right or a plan regression hides behind a zero."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from bench import _parse_metric_bytes, _exec_marker, _plan_cost


def test_parse_metric_bytes_formats():
    # the SQL-UI total-with-breakdown form: total on the last line
    assert _parse_metric_bytes(
        "total (min, med, max (stageId: taskId))\n921.0 B (230.0 B, 230.0 B, 231.0 B (stage 0.0: task 0))"
    ) == 921
    assert _parse_metric_bytes("1.5 KiB") == 1536
    assert _parse_metric_bytes("2.0 MiB (…)") == 2 * 1024 * 1024
    assert _parse_metric_bytes("3.25 GiB") == int(3.25 * (1 << 30))
    assert _parse_metric_bytes("0.0 B") == 0
    assert _parse_metric_bytes("garbage") == 0


def test_plan_cost_counts_exchanges_and_bytes(spark):
    marker = _exec_marker(spark)
    df = spark.range(0, 200_000).selectExpr("id % 13 AS k").groupBy("k").count()
    df.write.format("noop").mode("overwrite").save()
    cost = _plan_cost(spark, marker)
    assert cost["exchanges"] >= 1
    assert cost["shuffle_bytes"] > 0
    # a pure projection adds nothing
    marker = _exec_marker(spark)
    spark.range(1000).selectExpr("id * 2 AS y").write.format("noop").mode(
        "overwrite"
    ).save()
    cost = _plan_cost(spark, marker)
    assert cost == {"shuffle_bytes": 0, "exchanges": 0, "broadcasts": 0}
