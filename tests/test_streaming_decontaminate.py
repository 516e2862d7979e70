"""Streaming decontamination == batch decontamination over the same
files, with checkpointed incremental catch-up: the ingestion-time guard
reuses the oracle-checked batch operator per micro-batch."""

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pytest
from pyspark.sql import functions as F

from latex_ocr_spark.operators.dedup import decontaminate
from latex_ocr_spark.streaming.decontaminate import start_decontamination_stream


@pytest.fixture
def dirs():
    d = tempfile.mkdtemp(prefix="stream_decon_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, lo, hi):
    # every 10th doc is an exact copy of eval doc -1's text
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 = 0 THEN 'alpha beta gamma delta epsilon zeta eta theta' "
        "ELSE concat('tok', id, ' tk', id*3, ' tq', id*7, ' tz', id*11) END AS text",
    )


def _evalset(spark):
    return spark.createDataFrame(
        [(-1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )


def test_streaming_decontamination_matches_batch_and_resumes(spark, dirs):
    inp, rep, cln, ckpt = f"{dirs}/in", f"{dirs}/rep", f"{dirs}/cln", f"{dirs}/ckpt"
    evalset = _evalset(spark)

    first = _docs(spark, 0, 50)
    first.write.mode("append").parquet(inp)
    q = start_decontamination_stream(spark, inp, evalset, rep, cln, ckpt)
    q.awaitTermination(120)

    b_report, b_clean = decontaminate(first, evalset, threshold=0.5, ngram=3)
    got_rep = sorted(map(tuple, spark.read.parquet(rep).collect()))
    got_cln = sorted(r.doc_id for r in spark.read.parquet(cln).collect())
    assert got_rep == sorted(map(tuple, b_report.collect()))
    assert got_cln == sorted(r.doc_id for r in b_clean.collect())
    assert len(got_rep) == 5  # docs 0,10,20,30,40 flagged
    from latex_ocr_spark import cachepool

    cachepool.release()

    # catch-up: only the new files are processed; results accumulate
    second = _docs(spark, 50, 80)
    second.write.mode("append").parquet(inp)
    q = start_decontamination_stream(spark, inp, evalset, rep, cln, ckpt)
    q.awaitTermination(120)
    got_rep2 = spark.read.parquet(rep).count()
    got_cln2 = sorted(r.doc_id for r in spark.read.parquet(cln).collect())
    assert got_rep2 == 8  # + docs 50,60,70
    assert len(got_cln2) == 80 - 8 and len(set(got_cln2)) == len(got_cln2)
    cachepool.release()
