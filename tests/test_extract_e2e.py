"""End-to-end: the Spark extraction pipeline equals the pure-kernel
golden oracle row-for-row under stable ordering (FIXTURES.md §2)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from latex_ocr_spark.datagen.transcripts import gen_transcripts, golden_spans
from latex_ocr_spark.operators.extract import (
    extract_spans,
    extract_spans_with_failures,
    with_stable_order,
)
from latex_ocr_spark.sources.tables import synth_transcripts

N_CONVS = 120


def spark_rows(df):
    return [
        (r.conv_id, r.turn_idx, r.span_idx, r.raw_match, r.latex_norm)
        for r in df.collect()
    ]


def test_pipeline_matches_golden(spark):
    transcripts = synth_transcripts(spark, N_CONVS, parallelism=8)
    got = sorted(spark_rows(extract_spans(transcripts, repartition=8)))
    expected = [
        (g["conv_id"], g["turn_idx"], g["span_idx"], g["raw_match"], g["latex_norm"])
        for g in golden_spans(gen_transcripts(N_CONVS))
    ]
    assert got == sorted(expected)
    assert got == expected  # golden is already (conv, turn, span)-sorted
    assert len(got) > 200


def test_stable_order_deterministic_across_partitionings(spark):
    transcripts = synth_transcripts(spark, 50)
    a = extract_spans(transcripts, repartition=2, salt_buckets=4)
    b = extract_spans(transcripts, repartition=16, salt_buckets=128)
    rows_a = sorted(spark_rows(a))
    rows_b = sorted(spark_rows(b))
    assert rows_a == rows_b

    ordered = with_stable_order(b)
    per_conv = {}
    for r in ordered.collect():
        per_conv.setdefault(r.conv_id, []).append((r.conv_seq, r.turn_idx, r.span_idx))
    for conv, seqs in per_conv.items():
        seqs.sort()
        assert [s[0] for s in seqs] == list(range(1, len(seqs) + 1))
        assert seqs == sorted(seqs, key=lambda s: (s[1], s[2])), conv


def test_failed_turns_are_quarantined(spark):
    import pandas as pd

    rows = [
        ("c1", 0, "user", r"\newcommand{\a(}{x} $\a( + 1$", None, None),
        ("c1", 1, "user", r"fine $x+1$", None, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
    spans, failed, _raw = extract_spans_with_failures(df, repartition=2)
    assert [(r.conv_id, r.turn_idx) for r in failed.collect()] == [("c1", 0)]
    assert [(r.raw_match) for r in spans.collect()] == ["x+1"]


def test_no_math_and_null_text_turns_yield_nothing(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        [("c", 0, "no math here"), ("c", 1, None), ("c", 2, "")],
        columns=["conv_id", "turn_idx", "text"],
    )
    df = spark.createDataFrame(pdf)
    assert extract_spans(df).count() == 0
