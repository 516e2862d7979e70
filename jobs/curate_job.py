#!/usr/bin/env python
"""Production entry point: full corpus-curation funnel.

    spark-submit --py-files latex_ocr_spark.zip \
        jobs/curate_job.py \
        --input  s3://bucket/documents/        \
        --evalset s3://bucket/benchmarks/      \
        --output s3://bucket/curated/

Runs quality gates → exact dedup → near-dup clustering →
decontamination → cluster-safe split (plans/curate.py) and writes:

    <output>/documents/   surviving docs + split column
    <output>/report/      contamination report (if --evalset)
    <output>/clusters/    duplicate clusters
    <output>/funnel/      docs in/out per stage (one JSON line,
                          written through Spark so s3:// outputs work)

``--synth N`` generates N synthetic documents for a no-data smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents source: parquet path, JSONL "
                    "shards, or catalog table")
    ap.add_argument("--input-format", choices=("jsonl", "parquet", "table"),
                    help="override --input auto-detection (a DIRECTORY of "
                         "JSONL shards has no suffix to sniff)")
    ap.add_argument("--evalset-format", choices=("jsonl", "parquet", "table"),
                    help="override --evalset auto-detection (kept separate "
                         "from --input-format: a mixed-format run must not "
                         "parse the eval parquet as JSON)")
    ap.add_argument("--string-ids", action="store_true",
                    help="JSONL doc_id values are strings (the default long "
                         "schema would PERMISSIVE-null string ids and "
                         "silently empty the corpus)")
    ap.add_argument("--failfast", action="store_true",
                    help="abort on the first malformed JSONL line instead "
                         "of the PERMISSIVE null-row contract")
    ap.add_argument("--synth", type=int, help="synthesize N documents instead")
    ap.add_argument("--evalset", help="benchmark/eval documents (same shapes)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-punct-ratio", type=float, default=0.3)
    ap.add_argument("--dedup-threshold", type=float, default=0.5)
    ap.add_argument("--near-dup-method", choices=("lsh", "jaccard"), default="lsh",
                    help="near-dup pair generator: LSH+verify (scale path) or exact capped Jaccard")
    ap.add_argument("--ngram", type=int, default=1)
    ap.add_argument("--max-df", type=int,
                    help="hot-shingle cap (jaccard method only; default 1000)")
    ap.add_argument("--max-bucket-size", type=int,
                    help="degenerate-bucket cap (lsh method only)")
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--band-size", type=int, default=2)
    ap.add_argument("--redact", action="store_true",
                    help="scrub emails/URLs/number shapes before any hashing")
    ap.add_argument("--sample-fraction", type=float,
                    help="deterministic down-sample after decontamination")
    ap.add_argument("--val-fraction", type=float, default=0.1)
    ap.add_argument("--seed", default="split-seed-1")
    ap.add_argument("--high-dup-rate", action="store_true",
                    help="web-scale high-dup corpora: skip the forced "
                         "broadcasts of the dropped-id/cluster frames "
                         "(AQE decides; avoids executor OOM when 20-30%% "
                         "of docs sit in dup groups)")
    ap.add_argument("--auto-knobs", action="store_true",
                    help="pre-flight survey the input and fill every "
                         "blowup/recall knob left at its default "
                         "(operators/advisor.py; explicit non-default "
                         "flags win)")
    ap.add_argument("--auto-knobs-sample", type=float,
                    help="survey on this deterministic sample fraction "
                         "instead of the full input (0.01-0.001 at "
                         "corpus scale)")
    ap.add_argument("--checkpoint-dir",
                    help="make the funnel checkpoint-resumable "
                         "(plans/resumable.py): stage artifacts + lineage "
                         "land here and a killed run re-executes only "
                         "unfinished stages")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from latex_ocr_spark.plans.curate import curate_corpus
    from latex_ocr_spark.session import get_spark

    spark = get_spark("curate_job")

    from latex_ocr_spark.sources.documents import read_documents

    from pyspark.sql import types as T

    def load_docs(source: str, source_format: str):
        # parquet path, JSONL shards (.jsonl[.gz] — explicit schema, no
        # inference pass), or catalog table identifier
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

        # resumable mode: the funnel is assembled from the stage
        # lineage; the documents artifact is the checkpoint's own —
        # copy it to the output sink
        res = curate_corpus_resumable(
            spark, docs, args.checkpoint_dir, evalset, **kw
        )
        res.documents.write.mode("overwrite").parquet(f"{args.output}/documents")
    else:
        # deferred: the documents sink write below is the action that
        # resolves the funnel observations — no dedicated count pass
        res = curate_corpus(docs, evalset, collect_funnel=False, **kw)
        res.documents.write.mode("overwrite").parquet(f"{args.output}/documents")
        res.resolve_funnel()
    if res.contamination_report is not None:
        res.contamination_report.write.mode("overwrite").parquet(f"{args.output}/report")
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    funnel = {s: {"in": i, "out": o} for s, i, o in res.funnel}
    if funnel["split"]["out"] == 0 and funnel["quality_gates"]["in"] > 0:
        # a non-empty input curated down to NOTHING is almost always a
        # mis-read corpus (wrong id type / wrong format parsing every
        # row to NULL), not a real curation outcome — say so loudly
        print(
            "WARNING: 0 documents survived the funnel from "
            f"{funnel['quality_gates']['in']} inputs — check --input-format/"
            "--string-ids (a mis-typed JSONL schema NULLs every id under "
            "PERMISSIVE parsing)",
            file=sys.stderr,
        )
    # write through Spark so object-store outputs (s3://…) work — a
    # driver-local open() would silently strand the funnel on the node
    spark.createDataFrame([(json.dumps(funnel),)], "funnel string").coalesce(
        1
    ).write.mode("overwrite").text(f"{args.output}/funnel")
    print(json.dumps(funnel))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
