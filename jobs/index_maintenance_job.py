#!/usr/bin/env python
"""Offline maintenance for the streaming near-dedup survivor index:
compaction, retention pruning, and interrupted-swap recovery as one
spark-submit entry point.

Cluster deployment (run BETWEEN stream runs, after a clean shutdown —
the same single-writer contract compact_index/prune_index document):

    spark-submit --py-files latex_ocr_spark.zip \
        jobs/index_maintenance_job.py \
        --index s3://bucket/neardup_index/ \
        compact --num-partitions 256

    jobs/index_maintenance_job.py --index ... prune --keep-last-n 720
    jobs/index_maintenance_job.py --index ... prune --min-batch-id 50000
    jobs/index_maintenance_job.py --index ... recover

Why a job and not ad-hoc shell work: at 100 TB the index accumulates
one partition per micro-batch — thousands of tiny files per day —
and the maintenance choices (how many partitions, how much history to
keep) are retention POLICY that belongs in a reviewed, re-runnable
command line, not in interactive notebook state.  Pruning trades
recall for bounded index size: near-dups of a pruned survivor are
admitted afterwards (prune_index docstring states the contract).

Prints one JSON line per action with the stats the operators return.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="survivor index dir "
                    "(contains shingles/ and signatures/)")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = ap.add_subparsers(dest="action", required=True)

    sc = sub.add_parser("compact", help="fold per-batch partitions into "
                        "one batch_id=-1 partition per table")
    sc.add_argument("--num-partitions", type=int, default=32)

    sp = sub.add_parser("prune", help="drop index history past a cutoff "
                        "(recall tradeoff documented in prune_index)")
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--min-batch-id", type=int)
    g.add_argument("--keep-last-n", type=int)

    sub.add_parser("recover", help="finish/roll back an interrupted "
                   "compaction swap (no Spark session needed)")

    args = ap.parse_args()

    from latex_ocr_spark.streaming.near_dedup import (
        compact_index,
        list_index_batches,
        prune_index,
        recover_compaction,
    )

    if args.action == "recover":
        # pure filesystem repair — no session startup cost.  Takes the
        # same maintenance lease as compact/prune: repairing swap state
        # while another compaction is MID-swap would race its renames.
        from latex_ocr_spark.lease import DirLease

        with DirLease(args.index, name="_maintenance_lock",
                      role="index maintenance"):
            print(json.dumps({"recover": recover_compaction(args.index)}))
        return 0

    from latex_ocr_spark.session import get_spark

    spark = get_spark("index-maintenance", cores=args.cores,
                      shuffle_partitions=args.cores)
    if args.action == "compact":
        stats = compact_index(spark, args.index,
                              num_partitions=args.num_partitions)
        print(json.dumps({"compact": stats,
                          "batches": list_index_batches(args.index)}))
    else:
        stats = prune_index(spark, args.index,
                            min_batch_id=args.min_batch_id,
                            keep_last_n=args.keep_last_n)
        print(json.dumps({"prune": stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
