"""Vector similarity primitives over ``array<float>`` embedding columns
(north-star surface: approximate-nearest-neighbor / embedding dedup).

Determinism contract: every dot product is a SEQUENTIAL left fold in DOUBLE
(`0.0 + d1 + d2 + ...`) via Catalyst ``zip_with`` + ``aggregate`` HOFs; the
DuckDB oracles use ``list_reduce(list_prepend(0, products))`` — the same
association order — so cosines are bit-identical across engines. Float
arrays are cast to double BEFORE any arithmetic (exact), never after.

Scale notes (100 TB): brute-force kNN broadcasts the (small) query side and
computes map-local partial top-k before the final per-query shuffle; the IVF
variant prunes candidates to the probed centroid partitions — assignment is
a broadcast join against the centroid table, candidates co-shuffle on
centroid id. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (see module docstring)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def with_norm(vecs: DataFrame, vec_col: str = "v") -> DataFrame:
    return vecs.withColumn("nrm", norm(F.col(vec_col)))


def normalized_vectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, v: array<double>, nrm)."""
    return with_norm(
        embeddings.select("vec_id", "label", as_double(F.col("embedding")).alias("v"))
    )


def cosine(v1: Column, n1: Column, v2: Column, n2: Column) -> Column:
    return dot(v1, v2) / (n1 * n2)


def topk_per_query(pairs: DataFrame, k: int, query_col: str = "query_id") -> DataFrame:
    """Deterministic top-k: cosine desc, neighbor_id asc tiebreak.

    Scale shape: the row_number()+filter pattern is recognized by Spark's
    WindowGroupLimit rewrite — the executed plan carries
    ``WindowGroupLimit(..., Partial)`` BELOW the Exchange, so every map task
    pre-prunes to its local top-k and the per-query shuffle moves at most
    k rows per (query, input partition), not the full |Q| x |T| score
    stream (verified via executedPlan on knn_brute_force)."""
    w = Window.partitionBy(query_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def assign_to_centroids(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF assignment: nearest centroid by cosine (tiebreak: centroid id).
    ``centroids`` is broadcast — at scale it is tiny relative to the fact
    side, so assignment is a map-only stage."""
    c = centroids.select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
    )
    scored = vecs.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cid",
        cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cnrm")).alias("c_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
