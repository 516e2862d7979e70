"""SQL-facing function registration.

Makes the engine's kernels callable from ``spark.sql`` so SQL-first
users can run extraction without the DataFrame API:

    SELECT conv_id, turn_idx, posexplode(extract_math(text))
    FROM transcripts

All functions are Arrow-vectorized pandas UDFs (never row-at-a-time);
the heavy per-row logic stays in the parity-tested textkernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.ArrayType(T.StringType()))
def _extract_math(texts: pd.Series) -> pd.Series:
    from latex_ocr_spark.textkernel.pipeline import extract_turn

    return texts.map(
        lambda t: [s.raw_match for s in extract_turn(t)] if t is not None else []
    )


@pandas_udf(T.ArrayType(T.StringType()))
def _extract_math_normalized(texts: pd.Series) -> pd.Series:
    from latex_ocr_spark.textkernel.pipeline import extract_turn

    return texts.map(
        lambda t: [s.latex_norm for s in extract_turn(t)] if t is not None else []
    )


@pandas_udf(T.StringType())
def _post_process(formulas: pd.Series) -> pd.Series:
    from latex_ocr_spark.textkernel.normalize import post_process

    return formulas.map(lambda s: post_process(s) if s is not None else None)


@pandas_udf(T.StringType())
def _katex_normalize(formulas: pd.Series) -> pd.Series:
    from latex_ocr_spark.textkernel.normalize import normalize_formula_katex

    return formulas.map(
        lambda s: normalize_formula_katex(s) if s is not None else None
    )


def _make_bpe_encode(spark: SparkSession):
    """Build the bpe_encode UDF with the tokenizer spec *broadcast* —
    reading resources/tokenizer.json from executor-local disk would
    break on a real cluster where executors import the package from
    the --py-files zip (same policy as operators/tokenize.py)."""
    from latex_ocr_spark.textkernel.bpe import DEFAULT_TOKENIZER_PATH

    with open(DEFAULT_TOKENIZER_PATH, "rb") as fh:  # driver-side read
        spec = fh.read()
    bc = spark.sparkContext.broadcast(spec)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _bpe_encode(formulas: pd.Series) -> pd.Series:
        from latex_ocr_spark.operators.tokenize import _rebuild

        tk = _rebuild(bc)
        return formulas.map(lambda s: tk.encode(s) if s is not None else None)

    return _bpe_encode


def register_sql_functions(spark: SparkSession) -> None:
    """Install the engine's functions into the session's SQL namespace."""
    spark.udf.register("extract_math", _extract_math)
    spark.udf.register("extract_math_normalized", _extract_math_normalized)
    spark.udf.register("latex_post_process", _post_process)
    spark.udf.register("latex_katex_normalize", _katex_normalize)
    spark.udf.register("bpe_encode", _make_bpe_encode(spark))
