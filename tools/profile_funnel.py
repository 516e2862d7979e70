#!/usr/bin/env python
"""Job-level attribution for the composed funnel runners (guide §1.5).

Runs a bench query / composed runner once, then dumps every Spark job's
(description|name, duration) from the local UI REST API so the wall can
be attributed to the pipeline's internal actions (cluster-loop rounds,
cache builds, the sink pass).  NOT part of the frozen bench.

Usage: python tools/profile_funnel.py [curate_funnel|prepare_pipeline|
       dedup_embedding|...] [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def jobs_after(spark, first_job_id):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        jobs = json.load(r)
    out = []
    for j in jobs:
        if j["jobId"] < first_job_id:
            continue
        dur = None
        if "completionTime" in j and "submissionTime" in j:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t0 = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            t1 = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            dur = (t1 - t0).total_seconds()
        out.append(
            {
                "jobId": j["jobId"],
                "sec": dur,
                "desc": (j.get("description") or j.get("name", ""))[:110],
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numCompletedTasks"),
            }
        )
    return sorted(out, key=lambda x: x["jobId"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", default="curate_funnel")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench as B
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.session import get_spark

    spark = get_spark(
        "profile", cores=args.cores, shuffle_partitions=args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.range(1000).count()

    for attempt in range(args.runs):
        cachepool.release()
        tracker = spark.sparkContext.statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        first = (max(ids) + 1) if ids else 0
        t0 = time.time()
        if args.query == "curate_funnel":
            B.run_curate_funnel(spark, args.sf_dir)
        elif args.query == "prepare_pipeline":
            B.run_prepare_pipeline(spark, args.sf_dir)
        else:
            from latex_ocr_spark.plans.registry import QUERIES

            B._noop_write(QUERIES[args.query](spark, args.sf_dir))
        wall = time.time() - t0
        jobs = jobs_after(spark, first)
        print(f"=== run {attempt}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        for j in jobs:
            print(f"  job {j['jobId']:>4} {j['sec']:>7.2f}s stages={j['stages']:<3} tasks={j['tasks']:<5} {j['desc']}")
        print(f"  sum of job walls: {sum(j['sec'] or 0 for j in jobs):.2f}s")
    cachepool.release()


if __name__ == "__main__":
    main()
