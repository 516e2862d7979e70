#!/usr/bin/env python
"""Phase-level timing of the curate funnel's near-dup pair + cluster
chain (guide §1.5): label each materialization, print per-phase walls.
NOT part of the frozen bench."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators import dedup as D
    from latex_ocr_spark.session import get_spark

    spark = get_spark("profile_clusters", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1000).count()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def phase(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        print(f"{name:<40} {time.time() - t0:7.2f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    prof = cachepool.track(
        D.minhash_signatures(
            docs, 8, "text", "doc_id", 3, include_size=True, include_shingles=True
        )
    )
    phase("profile cache materialize (count)", prof.count)
    pairs = cachepool.track(
        D.lsh_verified_pairs(
            docs, threshold=0.5, num_hashes=8, band_size=2, text_col="text",
            id_col="doc_id", ngram=3, _arrs=prof, _signatures=prof,
        )
    )
    phase("pairs materialize (count)", pairs.count)

    # --- duplicate_clusters inline, phase-timed -------------------------
    e = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    phase("edges materialize (count)", edges.count)
    labels = phase(
        "init labels (distinct + localCheckpoint)",
        lambda: edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(),
    )
    for rnd in range(6):
        from pyspark.sql import Observation

        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        obs = Observation()
        new_labels = phase(
            f"round {rnd} (join + localCheckpoint)",
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
        print(f"   changed={changed}")
        if changed == 0:
            break
    cachepool.release()


if __name__ == "__main__":
    main()
