"""Tokenizer operators: BPE encode/decode columns with a broadcast vocab.

The tokenizer state (vocab + merges, ~100 KB) is broadcast once per
job (M6 'broadcast BPE tokenizer vocab'); executors rebuild the
tokenizer object lazily from the broadcast payload, never from disk.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _broadcast_tokenizer(df: DataFrame):
    from latex_ocr_spark.textkernel.bpe import DEFAULT_TOKENIZER_PATH

    spec = open(DEFAULT_TOKENIZER_PATH, "rb").read()
    return df.sparkSession.sparkContext.broadcast(spec)


def _rebuild(bc):
    """Executor-side: materialize a tokenizer from broadcast bytes once
    per worker (module-level memo keyed by broadcast id)."""
    import hashlib
    import json

    from latex_ocr_spark.textkernel import bpe

    cache = getattr(bpe, "_BC_CACHE", None)
    if cache is None:
        cache = bpe._BC_CACHE = {}
    key = hashlib.md5(bc.value).hexdigest()
    if key not in cache:
        cache[key] = bpe.BpeTokenizer(spec=json.loads(bc.value))
    return cache[key]


def with_tokens(
    df: DataFrame, text_col: str = "latex_norm", out_col: str = "tokens"
) -> DataFrame:
    """Append ``array<int>`` BPE ids ([BOS] … [EOS]) for ``text_col``."""
    bc = _broadcast_tokenizer(df)

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tk = _rebuild(bc)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(
                lambda s: tk.encode(s) if s is not None else None
            )
            yield pdf

    return df.mapInPandas(run, schema=schema)


def with_detokenized(
    df: DataFrame, tokens_col: str = "tokens", out_col: str = "decoded"
) -> DataFrame:
    """Append the decoded string for an id-array column (token2str
    semantics, utils/utils.py:94-98)."""
    bc = _broadcast_tokenizer(df)
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tk = _rebuild(bc)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[tokens_col].map(
                lambda ids: tk.decode(ids) if ids is not None else None
            )
            yield pdf

    return df.mapInPandas(run, schema=schema)


def filter_max_seq_len(df: DataFrame, tokens_col: str = "tokens", max_len: int = 512) -> DataFrame:
    """F6 max-seq-len gate (dataset.py:129-130)."""
    return df.filter(F.size(F.col(tokens_col)) <= max_len)
