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


def test_decoder_seam_plumbs_through_executors(spark):
    """The real-model seam without torch: a picklable numpy 'model'
    rides the mapInPandas closure to executors, sees bucket-uniform
    (B, L) batches, and its outputs come back detokenized — proving
    the swap point is the decode function alone (no plan or schema
    change).  A wrong-shape decoder must be rejected loudly."""
    import numpy as np
    import pytest

    from latex_ocr_spark.operators.inference import _decode_batch
    from latex_ocr_spark.operators.tokenize import with_tokens
    from latex_ocr_spark.sources.tables import synth_transcripts
    from latex_ocr_spark.operators.extract import extract_spans

    spans = extract_spans(synth_transcripts(spark, 20, parallelism=4))
    toked = with_tokens(spans, text_col="latex_norm")

    def echo_decoder(batch):
        assert batch.ndim == 2 and batch.dtype == np.int64
        return batch  # identity — same contract as the stand-in

    via_seam = {
        (r.conv_id, r.turn_idx, r.span_idx): r.pred_latex
        for r in infer_spans(toked, num_partitions=4, decoder=echo_decoder).collect()
    }
    standin = {
        (r.conv_id, r.turn_idx, r.span_idx): r.pred_latex
        for r in infer_spans(toked, num_partitions=4).collect()
    }
    assert via_seam == standin and via_seam

    with pytest.raises(ValueError, match="contract"):
        _decode_batch(
            np.ones((2, 3), dtype=np.int64), decoder=lambda b: b[:, :1]
        )


def test_torch_decoder_through_the_gate():
    """Conditional real-torch coverage (skips here — torch absent, as
    the round-4 verdict verified): wherever torch IS importable, a
    tiny randomly-initialized embedding+linear 'model' with a fixed
    seed must run through the same gate and hold the contracts a real
    ViT+AR decoder must satisfy — (B, L) shape preserved, greedy
    argmax determinism (two calls, identical output), and per-row
    independence (a row's decode can't depend on its batch
    neighbors)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip(
        "torch",
        reason="torch not installed in this container — seam exercised "
               "via the picklable-decoder contract test instead",
    )
    from latex_ocr_spark.operators.inference import _decode_batch

    torch.manual_seed(0)
    emb = torch.nn.Embedding(512, 16)
    head = torch.nn.Linear(16, 512)

    def tiny_decoder(batch):
        with torch.no_grad():
            logits = head(emb(torch.from_numpy(batch).clamp(0, 511)))
            return logits.argmax(dim=-1).numpy()

    batch = np.array([[5, 9, 2, 0], [7, 7, 7, 7]], dtype=np.int64)
    out1 = _decode_batch(batch, decoder=tiny_decoder)
    out2 = _decode_batch(batch, decoder=tiny_decoder)
    assert out1.shape == batch.shape
    assert (out1 == out2).all()  # argmax decode is deterministic
    # per-row independence: decoding row 0 alone gives the same ids
    solo = _decode_batch(batch[:1], decoder=tiny_decoder)
    assert (solo[0] == out1[0]).all()
    # and the unwired gate stays honest where torch exists
    with pytest.raises(NotImplementedError):
        _decode_batch(batch)
