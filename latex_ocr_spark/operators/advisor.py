"""Pre-flight corpus survey + blowup-knob advisor.

The dedup family's quadratic-blowup mitigations (``max_df`` for the
exact Jaccard path, ``max_bucket_size`` for the LSH path) need VALUES,
and at 100 TB picking them blind means either a silent k² blowup (cap
too high / unset) or silently discarding real near-dups (cap too
low).  This operator measures the quantities those knobs bound — on a
deterministic sample, so the survey costs a fraction of one corpus
scan — and turns them into concrete recommendations:

``survey_corpus``  one-row frame of corpus shape facts:
    n_docs_sampled, token-count percentiles, exact-dup rate, shingle
    document-frequency percentiles + max, and the estimated candidate
    fan-in of the hottest shingle (the k² term max_df exists to cap).

``suggest_knobs``  survey row → {max_df, max_bucket_size, num_hashes,
    min_tokens} with the reasoning encoded in one place instead of
    re-derived ad hoc per run.

Spark shape: ONE pass over the sampled corpus — the token counts and
text hashes ride a single projection, the shingle DF stats reuse
``doc_shingles``'s explode, and every aggregate is a map-side partial.
The sample is :func:`textstats.deterministic_sample` (md5-threshold,
retry/subset-stable), so two surveys of the same corpus agree exactly.

Document-frequency percentiles computed on a p-fraction sample are a
LOWER bound estimate of full-corpus df (each shingle's df scales
~1/p); ``suggest_knobs`` rescales by 1/p before thresholding — stated
here because an unscaled read of the survey underestimates hot-shingle
fan-in by exactly the sample factor.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from latex_ocr_spark.operators.dedup import doc_shingles
from latex_ocr_spark.operators.textstats import deterministic_sample


def survey_corpus(
    docs: DataFrame,
    sample_fraction: Optional[float] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    seed: str = "survey-seed-1",
) -> DataFrame:
    """One row of corpus shape facts (see module docstring).

    ``sample_fraction=None`` surveys the full input — right for test
    scale; at corpus scale pass 0.01-0.001 and read the df columns as
    1/fraction-scaled lower bounds (``suggest_knobs`` does this)."""
    sampled = (
        deterministic_sample(
            docs, fraction=sample_fraction, id_col=id_col, seed=seed
        )
        if sample_fraction is not None
        else docs
    )
    sampled = sampled.select(id_col, text_col)

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = sampled.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.md5(F.col(text_col)).alias("text_hash"),
    )
    doc_stats = base.agg(
        F.count(F.lit(1)).alias("n_docs_sampled"),
        F.percentile_approx(
            "n_tokens", [0.5, 0.9, 0.99], 10_000
        ).alias("token_percentiles"),
        F.count_distinct("text_hash").alias("n_distinct_texts"),
    ).withColumn(
        "exact_dup_rate",
        F.round(
            1 - F.col("n_distinct_texts") / F.col("n_docs_sampled"), 4
        ),
    )

    df_per_shingle = (
        doc_shingles(sampled, text_col=text_col, id_col=id_col, ngram=ngram)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    shingle_stats = df_per_shingle.agg(
        F.count(F.lit(1)).alias("n_distinct_shingles"),
        F.percentile_approx("df", [0.5, 0.99, 0.999], 10_000).alias(
            "df_percentiles"
        ),
        F.max("df").alias("df_max"),
        # the k² term: rows the hottest shingle alone would feed into
        # the inverted-index self-join
        F.max(F.col("df") * F.col("df")).alias("hottest_pair_fanin"),
    )
    return doc_stats.crossJoin(shingle_stats).withColumn(
        "sample_fraction", F.lit(sample_fraction).cast("double")
    )


def suggest_knobs(survey_row) -> dict:
    """Turn one ``survey_corpus`` row into dedup knob recommendations.

    Policy (stated so it can be argued with):

    - ``max_df`` — cap shingles above ~the 99.9th df percentile,
      rescaled to full-corpus counts when the survey was sampled, and
      never below 100 (tiny caps discard genuine overlap).  Shingles
      hotter than this are stop-word-like: their pair contribution is
      k² noise, not signal.
    - ``max_bucket_size`` — LSH band buckets bound the same blowup;
      hot buckets are usually boilerplate families, so the same
      rescaled-p999 cap applies.
    - ``num_hashes`` — 8 unless the corpus is exact-dup heavy (>10%):
      heavy duplication means many borderline near-dup families too,
      so buy recall with 16 hashes (more bands at band_size 2).
    - ``min_tokens`` — documents below ~5 tokens carry no usable
      shingle signal; raise the floor to the 50th-percentile-derived
      minimum only if the median itself is tiny.
    """
    scale = 1.0 / survey_row["sample_fraction"] if survey_row["sample_fraction"] else 1.0
    p999 = survey_row["df_percentiles"][2]
    cap = max(100, int(p999 * scale))
    heavy_dup = survey_row["exact_dup_rate"] > 0.10
    return {
        "max_df": cap,
        "max_bucket_size": cap,
        "num_hashes": 16 if heavy_dup else 8,
        "min_tokens": 5 if survey_row["token_percentiles"][0] >= 5 else 2,
    }


def resolve_auto_knobs(docs, args, parser, sample_fraction: Optional[float] = None) -> dict:
    """CLI glue for ``--auto-knobs`` (curate_job / prepare_job): survey
    the input once and fill in every blowup/recall knob the user left
    at its parser default — an explicitly passed NON-default value
    always wins over the recommendation.  Returns {knob: value} of
    what was applied, for the job to log.

    Only the cap matching the chosen near-dup method is applied
    (``max_df`` for 'jaccard', ``max_bucket_size`` for 'lsh') — the
    other must stay None or curate_corpus raises by design."""
    row = survey_corpus(docs, sample_fraction=sample_fraction).first()
    rec = suggest_knobs(row)
    applied = {}

    def maybe(name, value):
        if getattr(args, name) == parser.get_default(name):
            setattr(args, name, value)
            applied[name] = value

    maybe("min_tokens", rec["min_tokens"])
    maybe("num_hashes", rec["num_hashes"])
    if args.near_dup_method == "jaccard":
        maybe("max_df", rec["max_df"])
    else:
        maybe("max_bucket_size", rec["max_bucket_size"])
    return applied
