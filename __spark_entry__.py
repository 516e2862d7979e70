"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship extraction query over a deterministic synthetic
transcripts table (BASELINE.json input_hint schema) at smoke scale.
``queries``  — one entry per implemented operator (SURVEY.md §2 +
training-data ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql`` — DuckDB-equivalent SQL per query where expressible;
Python-kernel / xxhash64 ops are rows-only by design (their exact
semantics are covered by the reference-parity pytest suite).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package(spark: SparkSession) -> None:
    """Make latex_ocr_spark importable on executors regardless of how
    the driver built this session (--py-files equivalent)."""
    from latex_ocr_spark.session import _package_zip

    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added in this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract + normalize every math span from a synthetic
    multi-turn transcript table, stable-ordered (SURVEY.md §7 Phase 1)."""
    _ship_package(spark)
    from latex_ocr_spark.operators.extract import extract_spans, with_stable_order
    from latex_ocr_spark.sources.tables import synth_transcripts

    transcripts = synth_transcripts(spark, 120, parallelism=8)
    return with_stable_order(extract_spans(transcripts, repartition=8))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.plans.registry import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            # query-boundary cache ownership: frames persisted by the
            # PREVIOUS query (dedup shingles, tf-idf tf, global-id
            # ranges) are released here, after its result was consumed
            # and before this query plans — a 50-query session holds at
            # most one query's caches at a time
            cachepool.release()
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from latex_ocr_spark.plans.registry import ORACLES

    return dict(ORACLES)
