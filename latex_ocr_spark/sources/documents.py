"""Corpus document readers for the curation/dedup pipelines.

A real training corpus arrives as parquet, as JSONL shards (the
interchange format most crawls and dataset dumps use — one JSON object
per line, often gzip-compressed), or as a catalog table.  This module
gives every entrypoint ONE reader with the same path-or-identifier
seam as ``sources.tables.read_transcripts``:

- parquet / catalog: straight ``spark.read`` (pruning + pushdown as
  usual);
- JSONL: ``spark.read.json`` with an EXPLICIT schema — never schema
  inference, which is a full extra pass over the data (at 100 TB that
  is a second scan of the corpus before the first real job starts).
  Fields outside the schema are dropped at parse time (free column
  pruning); compressed shards (``.jsonl.gz`` …) decode transparently.

Malformed lines follow Spark's PERMISSIVE contract: the row survives
with NULL columns (and the raw line in ``_corrupt_record`` when the
caller asks for it), so a few bad shards can't kill a corpus-sized
job; the curation quality gate drops NULL-text rows anyway.  Callers
that prefer loud failure pass ``mode='FAILFAST'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from latex_ocr_spark.sources.tables import looks_like_path

#: suffixes (before optional compression extension) read as JSON-lines.
#: Bare ``.json`` is deliberately NOT auto-detected: the most common
#: .json layout is a single pretty-printed object/array, and parsing it
#: line-wise under PERMISSIVE silently yields all-NULL rows — a
#: line-delimited .json file is read by passing source_format='jsonl'.
_JSONL_SUFFIXES = (".jsonl", ".ndjson")
_COMPRESSION_SUFFIXES = ("", ".gz", ".bz2", ".zst", ".deflate")


def is_jsonl_path(source: str) -> bool:
    low = source.rstrip("/").lower()
    return any(
        low.endswith(base + comp)
        for base in _JSONL_SUFFIXES
        for comp in _COMPRESSION_SUFFIXES
    )


def documents_schema(
    id_col: str = "doc_id", text_col: str = "text", id_type: T.DataType = None
) -> T.StructType:
    """The (id, text) corpus schema; long ids by default, pass
    ``id_type=StringType()`` for string-keyed corpora (a first-class
    contract everywhere in this repo)."""
    return T.StructType(
        [
            T.StructField(id_col, id_type or T.LongType(), True),
            T.StructField(text_col, T.StringType(), True),
        ]
    )


def read_documents(
    spark: SparkSession,
    source: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_type: T.DataType = None,
    mode: str = "PERMISSIVE",
    keep_corrupt_record: bool = False,
    source_format: str = None,
) -> DataFrame:
    """Read a corpus from a parquet path, JSONL path, or catalog table
    identifier; returns (id_col, text_col) [+ ``_corrupt_record``],
    schema validated at plan time.

    ``source_format``: 'jsonl' | 'parquet' | 'table', or None to
    auto-detect (path-vs-identifier heuristic + filename suffix).  A
    DIRECTORY of JSONL shards has no suffix to sniff — pass
    ``source_format='jsonl'`` there.

    ``mode`` applies to JSONL parsing only ('PERMISSIVE' default,
    'FAILFAST' to abort on the first malformed line);
    ``keep_corrupt_record=True`` (PERMISSIVE only) retains the raw
    line of malformed records in a ``_corrupt_record`` column so a
    quarantine sink can keep them.
    """
    if source_format not in (None, "jsonl", "parquet", "table"):
        raise ValueError(f"unknown source_format {source_format!r}")
    if source_format is None:
        # jsonl suffix first: a bare relative shard name ('part.jsonl.gz'
        # living on the cluster FS, not the driver's) fails every
        # looks_like_path probe and would misroute to a table lookup
        if is_jsonl_path(source):
            source_format = "jsonl"
        elif looks_like_path(source):
            source_format = "parquet"
        else:
            source_format = "table"
    if source_format == "jsonl":
        schema = documents_schema(id_col, text_col, id_type)
        if keep_corrupt_record:
            schema = schema.add(T.StructField("_corrupt_record", T.StringType(), True))
        reader = spark.read.schema(schema).option("mode", mode)
        if keep_corrupt_record:
            reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
        df = reader.json(source)
    elif source_format == "parquet":
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)

    missing = [c for c in (id_col, text_col) if c not in df.columns]
    if missing:
        raise ValueError(
            f"documents source {source!r} lacks required columns {missing} "
            f"(have: {df.columns})"
        )
    cols = [id_col, text_col] + (
        ["_corrupt_record"] if "_corrupt_record" in df.columns else []
    )
    return df.select(*cols)
