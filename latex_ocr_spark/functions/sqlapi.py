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


@pandas_udf(T.ArrayType(T.IntegerType()))
def _bpe_encode(formulas: pd.Series) -> pd.Series:
    from latex_ocr_spark.textkernel.bpe import default_tokenizer

    tk = default_tokenizer()
    return formulas.map(lambda s: tk.encode(s) if s is not None else None)


def register_sql_functions(spark: SparkSession) -> None:
    """Install the engine's functions into the session's SQL namespace."""
    spark.udf.register("extract_math", _extract_math)
    spark.udf.register("extract_math_normalized", _extract_math_normalized)
    spark.udf.register("latex_post_process", _post_process)
    spark.udf.register("latex_katex_normalize", _katex_normalize)
    spark.udf.register("bpe_encode", _bpe_encode)
