"""Inference stand-in + eval metrics: the full chain
extract → tokenize → bucket/salt repartition → batched decode →
score must satisfy the BLEU=1.0 / exact-match invariant."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pandas as pd
from pyspark.sql import functions as F

from latex_ocr_spark.operators.evalmetrics import (
    edit_distance,
    metric_rollup,
    score_pairs,
    sentence_bleu,
    token_accuracy,
)
from latex_ocr_spark.operators.extract import extract_spans
from latex_ocr_spark.operators.inference import infer_spans, with_token_bucket
from latex_ocr_spark.operators.tokenize import with_tokens
from latex_ocr_spark.sources.tables import synth_transcripts


def test_kernel_metrics():
    assert sentence_bleu("a b c d e".split(), "a b c d e".split()) == 1.0
    assert sentence_bleu([], ["x"]) == 0.0
    assert 0 < sentence_bleu("a b c d x".split(), "a b c d e".split()) < 1
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert token_accuracy([1, 2, 3], [1, 2, 3]) == 1.0
    assert token_accuracy([1, 2], [1, 2, 9]) == 2 / 3


def test_end_to_end_inference_invariant(spark):
    transcripts = synth_transcripts(spark, 60)
    spans = extract_spans(transcripts)
    toked = with_tokens(spans)
    pred = infer_spans(toked, num_partitions=8, salt_buckets=16)
    pairs = pred.select(
        F.col("pred_latex").alias("pred"), F.col("latex_norm").alias("truth")
    )
    from latex_ocr_spark.operators.evalmetrics import corpus_bleu

    scored = score_pairs(pairs)
    scored.persist()
    rollup = metric_rollup(scored).collect()[0]
    assert rollup.n_pairs > 300
    assert rollup.exact_match_rate == 1.0  # the per-turn equality invariant
    assert rollup.avg_bleu == 1.0
    assert rollup.avg_edit_dist == 0.0
    assert rollup.avg_token_acc == 1.0
    assert corpus_bleu(scored) == 1.0  # reference-shaped corpus BLEU
    scored.unpersist()


def test_bucketing_is_shape_uniform(spark):
    pdf = pd.DataFrame({"latex_norm": ["x"] * 5 + ["y+z_{2}"] * 5, "conv_id": ["c"] * 10})
    toked = with_token_bucket(with_tokens(spark.createDataFrame(pdf)))
    buckets = {r.bucket for r in toked.select("bucket").collect()}
    assert buckets == {16}  # short formulas land in one 16-wide bucket


def test_score_pairs_detects_mismatch(spark):
    from latex_ocr_spark.operators.evalmetrics import corpus_bleu

    pairs = spark.createDataFrame(
        pd.DataFrame({"pred": [r"x + y", r"a"], "truth": [r"x+y", r"b"]})
    )
    scored = score_pairs(pairs)
    rows = scored.collect()
    by_truth = {r.truth: r for r in rows}
    # whitespace differences are erased by post_process: still exact
    assert by_truth["x+y"].exact_match == 1
    assert by_truth["b"].exact_match == 0
    assert by_truth["b"].edit_dist_norm == 1.0
    assert 0.0 <= corpus_bleu(scored) < 1.0
