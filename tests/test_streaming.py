"""Streaming extraction == batch extraction over the same files, with
checkpointed incremental catch-up (availableNow)."""

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pytest
from pyspark.sql import functions as F

from latex_ocr_spark.operators.extract import extract_spans
from latex_ocr_spark.sources.tables import synth_transcripts
from latex_ocr_spark.streaming.sinks import read_stream_output
from latex_ocr_spark.streaming.stream import start_extraction_stream


@pytest.fixture
def dirs():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _spans_set(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.span_idx, r.raw_match, r.latex_norm)
        for r in df.collect()
    )


def test_stream_matches_batch_and_resumes(spark, dirs):
    inp, out, ckpt = f"{dirs}/in", f"{dirs}/out", f"{dirs}/ckpt"
    all_t = synth_transcripts(spark, 40)

    # land the first half of the conversations
    first = all_t.filter(F.col("conv_id") < "conv-000020")
    first.write.mode("append").parquet(inp)
    q = start_extraction_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)
    got1 = _spans_set(read_stream_output(spark, out))
    assert got1 == _spans_set(extract_spans(first.select("conv_id", "turn_idx", "text")))

    # land the rest; a catch-up run must process only the new files
    second = all_t.filter(F.col("conv_id") >= "conv-000020")
    second.write.mode("append").parquet(inp)
    q = start_extraction_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)
    got2 = _spans_set(read_stream_output(spark, out))
    assert got2 == _spans_set(extract_spans(all_t.select("conv_id", "turn_idx", "text")))

    # re-run with nothing new: checkpoint makes it a no-op (no dupes)
    q = start_extraction_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)
    assert _spans_set(read_stream_output(spark, out)) == got2


def test_idempotent_sink_refuses_legacy_append_layout(spark, tmp_path):
    """A pre-idempotent deployment has root-level part files in its
    output dir; writing batch_id=N/ partitions next to them would break
    partition discovery on the NEXT read — the stream must refuse at
    start with a migration hint instead (idempotent=False keeps the
    legacy behavior)."""
    import pytest

    from latex_ocr_spark.streaming.sinks import assert_idempotent_layout

    legacy = str(tmp_path / "legacy_out")
    spark.range(5).selectExpr(
        "concat('c', id) AS conv_id", "CAST(id AS INT) AS turn_idx",
        "0 AS span_idx", "'x' AS raw_match", "'x' AS latex_norm"
    ).write.mode("overwrite").parquet(legacy)

    with pytest.raises(RuntimeError, match="plain-append"):
        assert_idempotent_layout(spark, legacy)
    # fresh and already-partitioned sinks pass
    assert_idempotent_layout(spark, str(tmp_path / "fresh"))
