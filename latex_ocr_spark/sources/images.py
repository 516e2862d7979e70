"""Image-dataset sources: the reference's Im2LatexDataset build
(dataset.py:57-79) as Spark scans.

- equations corpus: newline-delimited formulas where the *line number
  is the join key* (dataset.py:59-60);
- images: a directory of ``%07d.png`` files scanned with the
  binaryFile source, the id recovered from the file name
  (``indices = [int(basename.split('.')[0])]``);
- dataset build: size probe → dimension filter → ÷32 bucket →
  equi-join on the line id — the J1 load-bearing join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_equation_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(eq_id, latex) from a one-formula-per-line text file; eq_id is
    the 0-based line number (S1).

    Line order must follow the file, so this is the one place the
    engine drops to an RDD: ``zipWithIndex`` over a single-file text
    scan is offset-ordered and deterministic.  At corpus scale the
    reference's own convention (ids baked into file names / a column)
    replaces positional ids — see sources/tables.py transcripts.
    """
    rdd = spark.read.text(path).rdd.zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda pair: (pair[1], pair[0].value)),
        T.StructType(
            [
                T.StructField("eq_id", T.LongType(), False),
                T.StructField("latex", T.StringType(), True),
            ]
        ),
    )


def read_image_dir(spark: SparkSession, path: str) -> DataFrame:
    """(eq_id, png) from a directory of ``%07d.png`` files (S2)."""
    scan = spark.read.format("binaryFile").option("pathGlobFilter", "*.png").load(path)
    eq_id = F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1).cast("long")
    return scan.select(eq_id.alias("eq_id"), F.col("content").alias("png"))


def build_image_dataset(
    images: DataFrame,
    equations: DataFrame,
    min_dims=(32, 32),
    max_dims=(1024, 512),
) -> DataFrame:
    """The reference dataset constructor (dataset.py:57-79): probe
    sizes, filter to the legal dimension range, assign the ÷32 size
    bucket, join each image to its equation by line id.  The equations
    side is broadcast: at the reference's corpus scale (~10⁵ formulas,
    ~10 MB) it fits every executor comfortably.  Broadcast needs
    *absolute* smallness, not just smaller-than-images — beyond ~10⁸
    formulas drop the hint and let the equi-join shuffle on eq_id (the
    image side still never re-shuffles its payload more than once)."""
    from latex_ocr_spark.operators.images import (
        filter_dimensions,
        with_bucket,
        with_probed_size,
    )

    probed = with_bucket(filter_dimensions(with_probed_size(images), min_dims, max_dims))
    return probed.join(F.broadcast(equations), "eq_id", "inner").select(
        "eq_id", "latex", "png", "width", "height", "bucket"
    )
