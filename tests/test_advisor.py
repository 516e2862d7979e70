"""Pre-flight survey + knob advisor (operators/advisor.py): the facts
are exact on a planted corpus, the sampled survey is subset-stable,
and the recommendations move in the documented directions."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from latex_ocr_spark.operators.advisor import suggest_knobs, survey_corpus


def _corpus(spark, n=200, dup_every=10, hot_token=True):
    rows = []
    for i in range(n):
        base = f"va{i} vb{i*3} vc{i*7} vd{i*11} ve{i*13}"
        if hot_token:
            base += " common"  # a stop-word-like shingle in EVERY doc
        rows.append((i, base))
    for i in range(0, n, dup_every):  # exact dups
        rows.append((1000 + i, rows[i][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_survey_facts_are_exact_on_planted_corpus(spark):
    docs = _corpus(spark)
    row = survey_corpus(docs).first()
    assert row["n_docs_sampled"] == 220
    assert row["n_distinct_texts"] == 200
    assert row["exact_dup_rate"] == round(1 - 200 / 220, 4)
    # every doc is 6 tokens ('common' included)
    assert row["token_percentiles"] == [6, 6, 6]
    # the planted hot shingle dominates df_max: 'common' appears in
    # every distinct text (200) plus dup copies share it too
    assert row["df_max"] == 220
    assert row["hottest_pair_fanin"] == 220 * 220
    assert row["df_percentiles"][0] <= 2  # median shingle is rare


def test_sampled_survey_is_deterministic_and_flagged(spark):
    docs = _corpus(spark)
    a = survey_corpus(docs, sample_fraction=0.5).first()
    b = survey_corpus(docs, sample_fraction=0.5).first()
    assert a == b  # md5-threshold sample: no RNG
    assert a["sample_fraction"] == 0.5
    assert 0 < a["n_docs_sampled"] < 220


def test_suggested_knobs_move_with_the_corpus(spark):
    clean = survey_corpus(_corpus(spark, dup_every=1000)).first()
    duppy = survey_corpus(_corpus(spark, dup_every=5)).first()

    k_clean, k_dup = suggest_knobs(clean), suggest_knobs(duppy)
    # dup-heavy corpus buys recall with more hashes
    assert k_clean["num_hashes"] == 8 and k_dup["num_hashes"] == 16
    # caps never drop below the floor, and both cap the planted hot
    # shingle's fan-in below df_max
    for k in (k_clean, k_dup):
        assert k["max_df"] >= 100
        assert k["max_df"] == k["max_bucket_size"]
        assert k["min_tokens"] == 5
    # a sampled survey rescales the df cap by 1/fraction
    sampled = survey_corpus(_corpus(spark), sample_fraction=0.5).first()
    full = survey_corpus(_corpus(spark)).first()
    assert suggest_knobs(sampled)["max_df"] >= suggest_knobs(full)["max_df"] * 0.5


def test_survey_caps_feed_the_dedup_guards(spark):
    """End-to-end: the advisor's cap actually bounds the planted hot
    shingle's blowup when fed into jaccard_pairs(max_df=...)."""
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators.dedup import jaccard_pairs

    docs = _corpus(spark, n=60, dup_every=1000)
    row = survey_corpus(docs).first()
    knobs = suggest_knobs(row)
    # the 'common' shingle has df=60 > nothing (cap floor 100 keeps
    # it) — tighten to the hot shingle's df to prove the plumbing
    pairs_capped = jaccard_pairs(
        docs, threshold=0.3, ngram=1, max_df=min(knobs["max_df"], 10)
    ).count()
    cachepool.release()
    pairs_uncapped = jaccard_pairs(docs, threshold=0.3, ngram=1, max_df=1000).count()
    cachepool.release()
    assert pairs_capped <= pairs_uncapped


def test_auto_knobs_cli_end_to_end(tmp_path):
    """--auto-knobs: the job surveys its input, applies recommendations
    to knobs left at defaults, logs them, and completes."""
    import json
    import subprocess
    import sys as _sys

    out = str(tmp_path / "out")
    r = subprocess.run(
        [_sys.executable, "/root/repo/jobs/curate_job.py",
         "--synth", "40", "--output", out,
         "--near-dup-method", "jaccard", "--auto-knobs",
         # explicit non-default: must survive the advisor untouched
         "--min-tokens", "3"],
        capture_output=True, text=True, timeout=280,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    applied_line = [l for l in r.stderr.splitlines() if "auto_knobs" in l][-1]
    applied = json.loads(applied_line)["auto_knobs"]
    assert "max_df" in applied and applied["max_df"] >= 100
    assert "num_hashes" in applied
    assert "min_tokens" not in applied  # explicitly set -> not overridden
    funnel = json.loads(r.stdout.strip().splitlines()[-1])
    assert funnel["split"]["out"] == 40
