#!/usr/bin/env python
"""Production entry point: resumable math-span extraction over a
transcripts table.

Cluster deployment (the north-rule form):

    spark-submit --py-files latex_ocr_spark.zip \
        --master yarn --num-executors N \
        jobs/extract_job.py \
        --input  s3://bucket/transcripts/   \
        --output s3://bucket/extracted/     \
        --lineage s3://bucket/extracted_lineage/ \
        --units 4096

(zip via: cd repo && zip -r latex_ocr_spark.zip latex_ocr_spark)

Locally it runs under plain ``python`` or ``spark-submit`` — the
session builder ships the package to executors either way.  Re-running
after a failure resumes: only work units without a committed lineage
row execute (see operators/lineage.py).

``--synth N`` replaces --input with N synthetic conversations — the
smoke/demo path with no external data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input",
        help="transcripts source: a parquet path OR a catalog table "
        "identifier such as lake.db.transcripts (the Iceberg form — "
        "ship sources.tables.ICEBERG_SUBMIT_CONF via --conf)",
    )
    ap.add_argument("--synth", type=int, help="synthesize N conversations instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--units", type=int, default=256)
    args = ap.parse_args()

    from latex_ocr_spark.operators.lineage import run_resumable_extract
    from latex_ocr_spark.session import get_spark
    from latex_ocr_spark.sources.tables import read_transcripts, synth_transcripts

    spark = get_spark("extract_job")
    if args.synth:
        transcripts = synth_transcripts(spark, args.synth)
    elif args.input:
        # path → parquet; identifier → spark.read.table (Iceberg et al.);
        # schema validated at plan time either way
        transcripts = read_transcripts(spark, args.input)
    else:
        ap.error("one of --input/--synth is required")

    t0 = time.time()
    n_units = run_resumable_extract(
        spark, transcripts, args.output, args.lineage, n_units=args.units
    )
    rows = spark.read.parquet(args.output).count()
    print(
        f"processed {n_units} work units in {time.time() - t0:.1f}s; "
        f"output now holds {rows} spans at {args.output}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
