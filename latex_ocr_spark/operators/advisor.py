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
        # try_divide: an EMPTY survey (0 docs sampled) yields NULL
        # instead of an ANSI divide-by-zero — suggest_knobs turns that
        # into a clear "survey saw no shingles" diagnostic
        "exact_dup_rate",
        F.round(
            1 - F.try_divide(F.col("n_distinct_texts"), F.col("n_docs_sampled")), 4
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


class EmptySurveyError(ValueError):
    """The corpus survey saw no documents/shingles — knob
    recommendations are impossible, but the condition is benign
    (tiny/empty input) rather than a configuration error."""


def lsh_collision_prob(s: float, band_size: int, n_bands: int) -> float:
    """MinHash-LSH S-curve: P(candidate | Jaccard = s) with ``n_bands``
    bands of ``band_size`` rows = 1 - (1 - s^r)^b (Leskovec/Rajaraman/
    Ullman, *Mining of Massive Datasets* §3.4 — public textbook math)."""
    return 1.0 - (1.0 - s ** band_size) ** n_bands


def derive_lsh_params(
    threshold: float,
    target_recall: float = 0.9,
    max_hashes: int = 64,
    max_band_size: int = 4,
) -> dict:
    """Pick (num_hashes, band_size) from the S-curve so a pair at
    exactly the verify ``threshold`` becomes a candidate with
    probability ≥ ``target_recall`` — the worst case over every pair
    the verify step would keep, since the curve is increasing in s.

    Among feasible (r, b) grids the choice minimizes the collision
    probability of sub-threshold noise pairs (evaluated at s =
    threshold/2 — candidates cost a shuffled verify join, so a steeper
    curve is cheaper), tie-broken by fewer total hashes then larger
    bands.  Precision needs no knob: ``lsh_verified_pairs`` re-checks
    every candidate with exact Jaccard.

    Returns {num_hashes, band_size, expected_recall, noise_collision}.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    best = None
    noise_s = threshold / 2.0
    for r in range(1, max_band_size + 1):
        for b in range(1, max_hashes // r + 1):
            recall = lsh_collision_prob(threshold, r, b)
            if recall < target_recall:
                continue
            noise = lsh_collision_prob(noise_s, r, b)
            key = (round(noise, 6), r * b, -r)
            if best is None or key < best[0]:
                best = (key, r, b, recall, noise)
            break  # recall grows with b: the first feasible b is the
            # cheapest for this r; larger b only adds noise collisions
    if best is None:
        raise ValueError(
            f"no (band_size ≤ {max_band_size}, hashes ≤ {max_hashes}) grid "
            f"reaches recall {target_recall} at threshold {threshold} — "
            "raise max_hashes or lower the target"
        )
    _, r, b, recall, noise = best
    return {
        "num_hashes": r * b,
        "band_size": r,
        "expected_recall": round(recall, 4),
        "noise_collision": round(noise, 4),
    }


def suggest_knobs(
    survey_row,
    target_threshold: Optional[float] = None,
    target_recall: float = 0.9,
) -> dict:
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
    - ``num_hashes``/``band_size`` — with ``target_threshold`` set,
      derived from the S-curve so candidate recall at the threshold is
      ≥ ``target_recall`` (:func:`derive_lsh_params`); without it, the
      legacy heuristic: 8 hashes unless the corpus is exact-dup heavy
      (>10% — heavy duplication means many borderline near-dup
      families too), then 16.
    - ``min_tokens`` — documents below ~5 tokens carry no usable
      shingle signal; raise the floor to the 50th-percentile-derived
      minimum only if the median itself is tiny.

    Raises :class:`EmptySurveyError` when the survey saw no shingles
    (empty input, all-empty/whitespace texts, or a sample fraction
    that selected zero documents) — there is nothing to recommend
    from.  A derivation failure (infeasible threshold/recall grid)
    raises plain ``ValueError`` and is NOT the survey's fault — the
    distinction matters to resolve_auto_knobs, which degrades
    gracefully only on the former.
    """
    if (
        survey_row["n_docs_sampled"] == 0
        or survey_row["df_percentiles"] is None
        or survey_row["token_percentiles"] is None
    ):
        raise EmptySurveyError(
            "corpus survey saw no shingles (empty input, all-empty/"
            "whitespace texts, or a sample fraction that selected zero "
            "documents) — cannot recommend knobs; pass them explicitly "
            "or skip --auto-knobs"
        )
    scale = 1.0 / survey_row["sample_fraction"] if survey_row["sample_fraction"] else 1.0
    p999 = survey_row["df_percentiles"][2]
    cap = max(100, int(p999 * scale))
    heavy_dup = survey_row["exact_dup_rate"] > 0.10
    out = {
        "max_df": cap,
        "max_bucket_size": cap,
        "num_hashes": 16 if heavy_dup else 8,
        "min_tokens": 5 if survey_row["token_percentiles"][0] >= 5 else 2,
    }
    if target_threshold is not None:
        lsh = derive_lsh_params(target_threshold, target_recall)
        out["num_hashes"] = lsh["num_hashes"]
        out["band_size"] = lsh["band_size"]
        out["expected_recall"] = lsh["expected_recall"]
    return out


def resolve_auto_knobs(docs, args, parser, sample_fraction: Optional[float] = None) -> dict:
    """CLI glue for ``--auto-knobs`` (curate_job / prepare_job): survey
    the input once and fill in every blowup/recall knob the user left
    at its parser default — an explicitly passed NON-default value
    always wins over the recommendation.  Returns {knob: value} of
    what was applied, for the job to log.

    Only the cap matching the chosen near-dup method is applied
    (``max_df`` for 'jaccard', ``max_bucket_size`` for 'lsh') — the
    other must stay None or curate_corpus raises by design.

    The survey runs on the JOB's shingle space (``args.ngram`` is
    passed through): unigram document frequencies overestimate n-gram
    df, so surveying at the wrong ngram would make the p999 caps
    systematically looser than the stated policy.

    When num_hashes AND band_size are both left at their defaults, the
    pair is derived from the job's ``--dedup-threshold`` via the
    S-curve (:func:`derive_lsh_params`) — the two are coupled, so a
    user-pinned value for either disables the derivation rather than
    mixing a derived knob with a pinned one.

    An EMPTY survey (no documents / no shingles under the sample
    fraction) keeps every parser default and says so in the returned
    dict instead of crashing the job pre-flight."""
    rec, applied, maybe = survey_and_apply_lsh_knobs(
        docs, args, parser, threshold_attr="dedup_threshold",
        sample_fraction=sample_fraction,
    )
    if rec is None:
        return applied  # empty survey: parser defaults kept, with note
    maybe("min_tokens", rec["min_tokens"])
    if args.near_dup_method == "jaccard":
        maybe("max_df", rec["max_df"])
    else:
        maybe("max_bucket_size", rec["max_bucket_size"])
    return applied


def survey_and_apply_lsh_knobs(
    docs,
    args,
    parser,
    *,
    threshold_attr: str,
    sample_fraction: Optional[float] = None,
):
    """The shared --auto-knobs core (curate/prepare jobs AND the
    streaming near-dedup job): survey at ``args.ngram``, derive the
    coupled (num_hashes, band_size) from the S-curve ONLY when both
    flags sit at their parser defaults (threshold read from
    ``threshold_attr`` — the jobs name it differently), and apply the
    pair.  When either is user-pinned the legacy num_hashes heuristic
    still fills a defaulted num_hashes, and no derivation runs — so an
    infeasible threshold cannot crash a run whose derivation result
    would be discarded anyway.

    Returns ``(rec, applied, maybe)``: the raw recommendation (or
    ``None`` after an empty survey — the ONLY swallowed failure; a
    derivation failure from a bad threshold raises), the applied-knobs
    dict for job logging, and the ``maybe(name, value)`` closure for
    the caller's job-specific knobs (caps, min_tokens)."""
    lsh_defaulted = (
        args.num_hashes == parser.get_default("num_hashes")
        and args.band_size == parser.get_default("band_size")
    )
    try:
        rec = suggest_knobs(
            survey_corpus(
                docs, sample_fraction=sample_fraction, ngram=args.ngram
            ).first(),
            target_threshold=(
                getattr(args, threshold_attr) if lsh_defaulted else None
            ),
        )
    except EmptySurveyError as e:
        return None, {"_note": f"survey empty, parser defaults kept ({e})"}, None
    applied: dict = {}

    def maybe(name, value):
        if getattr(args, name) == parser.get_default(name):
            setattr(args, name, value)
            applied[name] = value

    maybe("num_hashes", rec["num_hashes"])
    if lsh_defaulted and "band_size" in rec:
        maybe("band_size", rec["band_size"])
        applied["expected_recall"] = rec["expected_recall"]
    return rec, applied, maybe
