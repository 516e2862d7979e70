"""Approximate/exact nearest-neighbor search over embedding columns.

Brute-force cosine top-k is the exact baseline (broadcast the query
set, never cross-join two big sides); the LSH-bucketed variant is the
scale path: random-hyperplane signs computed from deterministic
per-dimension coefficients, candidates via band-key equi-join, exact
re-rank only inside buckets.

All arithmetic is JVM-side higher-order functions on array<double> —
no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus
    side streams through one codegen'd stage.  Similarity is rounded to
    4 decimals and ties break on candidate id, making the ranking
    deterministic and engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                4,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    With ``num_planes`` > 0 candidates are restricted to hyperplane-LSH
    buckets first (the 100 TB path — all-pairs work shrinks by ~2^planes
    at some recall cost); 0 = exact all-pairs, used as the oracle-
    checkable baseline at test scale.
    """
    v = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if num_planes:
        b = hyperplane_buckets(embeddings, num_planes, id_col, vec_col)
        a_side = v.join(b, "id").select(F.col("id").alias("a_id"), F.col("v").alias("av"), "bucket")
        b_side = v.join(b, "id").select(F.col("id").alias("b_id"), F.col("v").alias("bv"), "bucket")
        pairs = a_side.join(b_side, ["bucket"]).filter(F.col("a_id") < F.col("b_id"))
    else:
        a_side = v.select(F.col("id").alias("a_id"), F.col("v").alias("av"))
        b_side = v.select(F.col("id").alias("b_id"), F.col("v").alias("bv"))
        pairs = a_side.join(b_side, F.col("a_id") < F.col("b_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(
            _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv"))), 4
        ),
    )
    return scored.filter(F.col("cosine") >= threshold).select("a_id", "b_id", "cosine")


def hyperplane_buckets(
    embeddings: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) random-hyperplane LSH signature.

    Plane p's coefficient for dimension d is a deterministic pseudo-
    random ±-free value derived from xxhash64(p ‖ d): portable across
    runs and executors with zero driver state to broadcast.
    """
    v = _as_double(F.col(vec_col))
    signs = []
    for p in range(num_planes):
        # pmod, not %: Spark's % keeps the dividend sign, which would
        # bias every coefficient negative and collapse all non-negative
        # vectors into one bucket
        coef = lambda x, i, _p=p: x * (
            F.pmod(
                F.xxhash64(F.concat(F.lit(f"{_p}#"), i.cast("string"))), F.lit(1000)
            ).cast("double")
            / 1000.0
            - 0.4995
        )
        proj = F.aggregate(
            F.zip_with(v, F.transform(F.sequence(F.lit(0), F.size(v) - 1), lambda i: i), lambda x, i: coef(x, i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        signs.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** p))
    bucket = sum(signs[1:], signs[0])
    return embeddings.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN variant: exact re-rank restricted to hyperplane buckets.

    Recall < 1 by construction; at corpus scale the bucket join reduces
    the scored pairs by ~2^num_planes versus brute force.
    """
    b_corpus = hyperplane_buckets(embeddings, num_planes, id_col, vec_col)
    b_query = hyperplane_buckets(queries, num_planes, id_col, vec_col)
    cand = (
        b_query.withColumnRenamed("id", "query_id")
        .join(b_corpus.withColumnRenamed("id", "neighbor_id"), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    cv = embeddings.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
