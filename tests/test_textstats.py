"""Pins for the text-analysis operators whose registry slots were
consolidated in round 3: the merged queries must stay equal, column by
column, to the standalone operators they absorbed, and the pandas-UDF
language-ID seam must stay equal to the expression form that carries
the driver oracle."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from latex_ocr_spark.operators import textstats as TS


def _docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


def test_lang_id_pandas_matches_expression(spark, sf_small):
    """The Arrow-batched UDF seam (where a fastText/CLD3 model plugs
    in) must agree row-for-row with the expression form — the form
    that carries the driver oracle (text_langid)."""
    docs = _docs(spark, sf_small)
    expr = {r["id"]: r["lang_pred"] for r in TS.lang_id(docs).collect()}
    udf = {r["id"]: r["lang_pred"] for r in TS.lang_id_pandas(docs).collect()}
    assert expr == udf
    assert len(expr) == docs.count()


def test_text_profile_matches_standalone_operators(spark, sf_small):
    """text_profile = token_counts ⊕ quality_scores ⊕ fingerprints as
    one projection; every column must match its source operator."""
    docs = _docs(spark, sf_small)
    prof = {r["id"]: r.asDict() for r in TS.text_profile(docs).collect()}

    for r in TS.token_counts(docs).collect():
        assert prof[r["id"]]["n_tokens"] == r["n_tokens"]
        assert prof[r["id"]]["n_chars_seen"] == r["n_chars_seen"]
    for r in TS.quality_scores(docs).collect():
        for col in ("mean_token_len", "stopword_ratio", "punct_ratio"):
            assert prof[r["id"]][col] == r[col], (r["id"], col)
    for r in TS.fingerprints(docs).collect():
        assert prof[r["id"]]["fingerprint"] == r["fingerprint"]


def test_text_profile_is_single_scan_no_shuffle(spark, sf_small):
    """The merge's reason to exist: one pruned scan, one codegen'd
    projection, zero exchanges (vs. three scans or a self-join)."""
    plan = (
        TS.text_profile(_docs(spark, sf_small))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1
