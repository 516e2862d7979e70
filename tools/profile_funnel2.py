#!/usr/bin/env python
"""Phase-timing inside the REAL curate funnel: monkeypatch
duplicate_clusters with a phase-printing clone, then run bench's
run_curate_funnel.  NOT part of the frozen bench."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import DataFrame, Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed_duplicate_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    spark = pairs.sparkSession

    def phase(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        print(f"    [clusters] {name:<34} {time.time() - t0:7.2f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    e = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = phase(
        "init labels",
        lambda: edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(),
    )
    changed = 0
    for rnd in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        obs = Observation()
        new_labels = phase(
            f"round {rnd}",
            lambda: labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("id", "label")
            .localCheckpoint(),
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist(blocking=False)
    if changed != 0:
        raise RuntimeError("no converge")
    return labels.select("id", F.col("label").alias("cluster_id"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench as B
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators import dedup as D
    from latex_ocr_spark.session import get_spark

    D.duplicate_clusters = timed_duplicate_clusters
    import latex_ocr_spark.plans.curate as C

    # curate imports dedup as D module ref — same module object, so the
    # monkeypatch above is already visible there
    spark = get_spark("profile_funnel2", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1000).count()
    for attempt in range(2):
        cachepool.release()
        t0 = time.time()
        B.run_curate_funnel(spark, sf_dir)
        print(f"run {attempt}: total {time.time() - t0:.2f}s", flush=True)
    cachepool.release()


if __name__ == "__main__":
    main()
