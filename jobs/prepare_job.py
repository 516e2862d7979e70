#!/usr/bin/env python
"""Production entry point: the full training-prep chain in ONE
spark-submit — the reference's §3.2 pipeline (corpus acquisition
arxiv.py:147-164 → dataset tokenize/size-gate dataset.py:233-259)
generalized to a curated, packed, training-ready table:

    spark-submit --py-files latex_ocr_spark.zip \
        jobs/prepare_job.py \
        --input  s3://bucket/documents/     \
        --evalset s3://bucket/benchmarks/   \
        --output s3://bucket/prepared/      \
        --checkpoint-dir s3://bucket/prepared/_ckpt \
        --budget 2048

Stages (all individually oracle-/parity-tested operators):

    read_documents        JSONL / parquet / catalog table
      → curate_corpus     quality gates → exact dedup → near-dup
                          clusters → decontamination → cluster-safe
                          split  (resumable when --checkpoint-dir)
      → with_tokens       broadcast-vocab BPE ids (Arrow batches)
      → filter_max_seq_len optional hard length gate
      → pack_sequences    per-split first-fit token packing
      → sink              parquet partitioned by split, or a bucketed
                          managed table (--bucket-table) for
                          exchange-free downstream joins

Outputs under --output:
    packed/      curated docs + tokens + (pack_id, pack_offset) —
                 pack ids are globally unique and no pack ever mixes
                 train and val rows
    pack_stats/  per-pack fill ratios (the padding-waste report)
    report/      contamination report (when --evalset)
    clusters/    duplicate clusters
    funnel/      docs in/out per curation stage (one JSON line)

With --checkpoint-dir the curation stages are checkpoint-resumable
(plans/resumable.py): a killed run re-executes only unfinished stages.
Without it, the single-pass funnel runs with deferred count resolution
riding the packed-table write — zero dedicated count passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prepare_tables(spark, docs, evalset, args):
    """The composed chain, importable for tests/bench: returns
    (packed, result) with every frame still lazy except the actions
    the curation mode itself performs; per-pack stats come from
    :func:`packed_stats` over the WRITTEN table."""
    from pyspark.sql import functions as F

    from latex_ocr_spark.operators.packing import pack_sequences, pack_stats
    from latex_ocr_spark.operators.tokenize import filter_max_seq_len, with_tokens

    kw = dict(
        min_tokens=args.min_tokens,
        max_punct_ratio=args.max_punct_ratio,
        dedup_threshold=args.dedup_threshold,
        near_dup_method=args.near_dup_method,
        ngram=args.ngram,
        num_hashes=args.num_hashes,
        band_size=args.band_size,
        max_bucket_size=args.max_bucket_size,
        max_df=args.max_df,
        redact=args.redact,
        sample_fraction=args.sample_fraction,
        val_fraction=args.val_fraction,
        seed=args.seed,
        assume_small_side_frames=not args.high_dup_rate,
    )
    if args.checkpoint_dir:
        from latex_ocr_spark.plans.resumable import curate_corpus_resumable

        res = curate_corpus_resumable(
            spark, docs, args.checkpoint_dir, evalset, **kw
        )
    else:
        from latex_ocr_spark.plans.curate import curate_corpus

        # deferred: the packed-table write resolves the funnel counts
        res = curate_corpus(docs, evalset, collect_funnel=False, **kw)

    toks = with_tokens(res.documents, text_col="text", out_col="tokens")
    if args.max_seq_len:
        toks = filter_max_seq_len(toks, max_len=args.max_seq_len)
    toks = toks.withColumn("n_tokens", F.size("tokens"))

    # group_col='split': no pack ever mixes train and val rows (val
    # text leaking into a training batch), in ONE shuffle + ONE pass —
    # a filter-per-split union would scan the curation pipeline twice
    # and double-count the deferred funnel observations
    packed = pack_sequences(
        toks, budget=args.budget, num_partitions=args.pack_partitions,
        group_col="split",
    )
    return packed, res


def packed_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill report with the pack's split tagged on (pack ids
    are globally unique and never mix splits, so ``min(split)`` is THE
    split).  Computed from the WRITTEN packed table (cheap columnar
    re-read), never by re-running the pipeline."""
    from pyspark.sql import functions as F

    from latex_ocr_spark.operators.packing import pack_stats

    splits = packed.filter(F.col("pack_id").isNotNull()).groupBy("pack_id").agg(
        F.min("split").alias("split")
    )
    return pack_stats(packed, budget).join(splits, "pack_id")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--input-format", choices=("jsonl", "parquet", "table"))
    ap.add_argument("--evalset")
    ap.add_argument("--evalset-format", choices=("jsonl", "parquet", "table"))
    ap.add_argument("--string-ids", action="store_true")
    ap.add_argument("--failfast", action="store_true")
    ap.add_argument("--synth", type=int,
                    help="synthesize N documents for a no-data smoke run")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir",
                    help="enable checkpoint-resumable curation stages")
    # curation knobs (same defaults as curate_job)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-punct-ratio", type=float, default=0.3)
    ap.add_argument("--dedup-threshold", type=float, default=0.5)
    ap.add_argument("--near-dup-method", choices=("lsh", "jaccard"), default="lsh")
    ap.add_argument("--ngram", type=int, default=1)
    ap.add_argument("--max-df", type=int)
    ap.add_argument("--max-bucket-size", type=int)
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--band-size", type=int, default=2)
    ap.add_argument("--redact", action="store_true")
    ap.add_argument("--sample-fraction", type=float)
    ap.add_argument("--val-fraction", type=float, default=0.1)
    ap.add_argument("--seed", default="split-seed-1")
    ap.add_argument("--high-dup-rate", action="store_true")
    # training-prep knobs
    ap.add_argument("--auto-knobs", action="store_true",
                    help="pre-flight survey the input and fill every "
                         "blowup/recall knob left at its default "
                         "(operators/advisor.py; explicit non-default "
                         "flags win)")
    ap.add_argument("--auto-knobs-sample", type=float,
                    help="survey on this deterministic sample fraction "
                         "instead of the full input (0.01-0.001 at "
                         "corpus scale)")
    ap.add_argument("--budget", type=int, default=2048,
                    help="token budget per pack")
    ap.add_argument("--max-seq-len", type=int,
                    help="drop rows whose BPE id count exceeds this "
                         "BEFORE packing (F6 gate; over-budget rows "
                         "are otherwise quarantined by the packer)")
    ap.add_argument("--pack-partitions", type=int,
                    help="fixed hash-partition count for deterministic "
                         "packing across cluster sizes")
    ap.add_argument("--bucket-table",
                    help="ALSO write the packed table as a bucketed "
                         "managed table on doc_id (exchange-free "
                         "downstream joins)")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from latex_ocr_spark.session import get_spark
    from latex_ocr_spark.sources.documents import read_documents

    spark = get_spark("prepare_job")

    def load_docs(source, source_format):
        return read_documents(
            spark, source, source_format=source_format,
            id_type=T.StringType() if args.string_ids else None,
            mode="FAILFAST" if args.failfast else "PERMISSIVE",
        )

    if args.synth is not None:
        if args.synth <= 0:
            ap.error("--synth must be a positive document count")
        docs = spark.range(args.synth).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("sa"), F.col("id").cast("string"),
                F.lit(" sb"), (F.col("id") * 3).cast("string"),
                F.lit(" sc"), (F.col("id") * 7).cast("string"),
                F.lit(" sd"), (F.col("id") * 11).cast("string"),
                F.lit(" se"), (F.col("id") * 13).cast("string"),
            ).alias("text"),
        )
    elif args.input:
        docs = load_docs(args.input, args.input_format)
    else:
        ap.error("one of --input/--synth is required")
    evalset = (
        load_docs(args.evalset, args.evalset_format) if args.evalset else None
    )
    if args.auto_knobs:
        from latex_ocr_spark.operators.advisor import resolve_auto_knobs

        applied = resolve_auto_knobs(
            docs, args, ap, sample_fraction=args.auto_knobs_sample
        )
        print(json.dumps({"auto_knobs": applied}), file=sys.stderr)

    packed, res = prepare_tables(spark, docs, evalset, args)

    # the run's primary action: write the packed table (partitioned by
    # split so a trainer reads only its side) — in deferred mode this
    # write also resolves every funnel observation
    packed.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.output}/packed"
    )
    res.resolve_funnel()
    stats = packed_stats(
        spark.read.parquet(f"{args.output}/packed"), args.budget
    )
    stats.write.mode("overwrite").parquet(f"{args.output}/pack_stats")
    if res.contamination_report is not None:
        res.contamination_report.write.mode("overwrite").parquet(
            f"{args.output}/report"
        )
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    if args.bucket_table:
        from latex_ocr_spark.sources.bucketed import write_bucketed

        write_bucketed(
            spark.read.parquet(f"{args.output}/packed"),
            args.bucket_table, key="doc_id", num_buckets=64,
        )

    funnel = {s: {"in": i, "out": o} for s, i, o in res.funnel}
    if funnel["split"]["out"] == 0 and funnel["quality_gates"]["in"] > 0:
        print(
            "WARNING: 0 documents survived the funnel from "
            f"{funnel['quality_gates']['in']} inputs — check --input-format/"
            "--string-ids (a mis-typed JSONL schema NULLs every id under "
            "PERMISSIVE parsing)",
            file=sys.stderr,
        )
    spark.createDataFrame([(json.dumps(funnel),)], "funnel string").coalesce(
        1
    ).write.mode("overwrite").text(f"{args.output}/funnel")
    print(json.dumps(funnel))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
