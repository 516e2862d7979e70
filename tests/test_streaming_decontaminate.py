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
from latex_ocr_spark.streaming.sinks import read_stream_output


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
    got_rep = sorted(map(tuple, read_stream_output(spark, rep).collect()))
    got_cln = sorted(r.doc_id for r in read_stream_output(spark, cln).collect())
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
    got_rep2 = read_stream_output(spark, rep).count()
    got_cln2 = sorted(r.doc_id for r in read_stream_output(spark, cln).collect())
    assert got_rep2 == 8  # + docs 50,60,70
    assert len(got_cln2) == 80 - 8 and len(set(got_cln2)) == len(got_cln2)
    cachepool.release()


def test_replayed_batch_never_duplicates_idempotent_output(spark, dirs):
    """The at-least-once fix: a batch that crashes AFTER its sink
    writes (before the checkpoint commit) is replayed on restart.
    With the default idempotent batch_id-partitioned dynamic
    overwrite, the replay REPLACES the batch's own output — zero
    duplicate rows; the legacy append path demonstrably duplicates
    and needs dedup_on_read."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from latex_ocr_spark.streaming.sinks import dedup_on_read

    evalset = _evalset(spark)
    docs = _docs(spark, 0, 30)

    # --- idempotent (default) ---
    inp, rep, cln, ckpt = (f"{dirs}/i_in", f"{dirs}/i_rep",
                           f"{dirs}/i_cln", f"{dirs}/i_ckpt")
    docs.write.mode("append").parquet(inp)
    q = start_decontamination_stream(
        spark, inp, evalset, rep, cln, ckpt, _fail_batches={0}
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)
    # the writes landed before the crash…
    assert read_stream_output(spark, cln).count() == 27
    # …and the replay on restart replaces, never appends
    q = start_decontamination_stream(spark, inp, evalset, rep, cln, ckpt)
    q.awaitTermination(120)
    cleaned = [r.doc_id for r in read_stream_output(spark, cln).collect()]
    assert len(cleaned) == 27 and len(set(cleaned)) == 27  # 0,10,20 dropped
    assert read_stream_output(spark, rep).count() == 3

    # --- legacy append path: same crash duplicates; dedup_on_read
    # restores the exactly-once view (the documented contract) ---
    inp2, rep2, cln2, ckpt2 = (f"{dirs}/a_in", f"{dirs}/a_rep",
                               f"{dirs}/a_cln", f"{dirs}/a_ckpt")
    docs.write.mode("append").parquet(inp2)
    q = start_decontamination_stream(
        spark, inp2, evalset, rep2, cln2, ckpt2,
        idempotent=False, _fail_batches={0},
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)
    q = start_decontamination_stream(
        spark, inp2, evalset, rep2, cln2, ckpt2, idempotent=False
    )
    q.awaitTermination(120)
    raw = [r.doc_id for r in spark.read.parquet(cln2).collect()]
    assert len(raw) == 54 and len(set(raw)) == 27  # every row twice
    deduped = dedup_on_read(spark, cln2, ["doc_id"])
    assert deduped.count() == 27
    assert dedup_on_read(spark, rep2, ["corpus_id", "eval_id"]).count() == 3
