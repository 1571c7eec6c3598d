"""Deterministic corpus sampling — training-data pipeline operators over
``documents`` (north-star surface: a 100 TB corpus needs reproducible
sampling, not ``rand()``).

All three queries key their randomness on a Knuth multiplicative hash of
``doc_id`` (``h = (doc_id * 2654435761) % 2^32``) computed with plain 64-bit
integer arithmetic — identical in Spark and DuckDB, so samples are
bit-reproducible across engines, runs, and partitionings (the property
``rand()``/``TABLESAMPLE`` cannot give). No shuffle is introduced by the
Bernoulli filter (pure map); the stratified variant shuffles once on the
stratum key, same as any per-group top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from .registry import query

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative hashing
MOD = 1 << 32
SAMPLE_PCT = 10          # Bernoulli keep-rate, percent
STRATA_N = 5             # docs kept per (lang, source) stratum
SPLIT_BUCKETS = (8, 1, 1)  # train/valid/test out of 10 hash buckets

_H_SQL = f"((doc_id * {KNUTH}) % {MOD})"


def _h_col():
    return (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD)


@query(
    "sample_bernoulli",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_H_SQL} % 100 < {SAMPLE_PCT}
""",
)
def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~{pct}% Bernoulli sample: keep iff hash(doc_id) mod 100
    falls under the rate. Pure map-side filter — at 100 TB this subsamples a
    corpus with zero shuffle and perfect reproducibility (re-running, or
    running on a differently-partitioned copy, selects the same rows, unlike
    ``df.sample``'s partition-seeded RNG)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_h_col() % 100 < SAMPLE_PCT).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "sample_stratified",
    oracle=f"""
WITH h AS (
    SELECT doc_id, lang, source, n_chars, {_H_SQL} AS hv FROM documents
), ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                   ORDER BY hv, doc_id) AS INTEGER) AS rk
    FROM h
)
SELECT doc_id, lang, source, n_chars, rk FROM ranked WHERE rk <= {STRATA_N}
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-N sample: per (lang, source) stratum keep the N docs
    with the smallest hash (hash order == uniform random order, but
    deterministic). One shuffle on the stratum key; Spark rewrites the
    rank-filter to WindowGroupLimit, so each map task pre-prunes to its
    local top-N before the exchange — per-stratum skew cannot blow up the
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(F.asc("hv"), F.asc("doc_id"))
    return (
        d.select("doc_id", "lang", "source", "n_chars", _h_col().alias("hv"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= STRATA_N)
        .drop("hv")
        .select("doc_id", "lang", "source", "n_chars", "rk")
    )


@query(
    "train_test_split",
    oracle=f"""
WITH assigned AS (
    SELECT *,
        CASE WHEN {_H_SQL} % 10 < {SPLIT_BUCKETS[0]} THEN 'train'
             WHEN {_H_SQL} % 10 < {SPLIT_BUCKETS[0] + SPLIT_BUCKETS[1]} THEN 'valid'
             ELSE 'test' END AS split
    FROM documents
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT)       AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)   AS n_chars_total,
       MIN(doc_id)                    AS min_doc_id,
       MAX(doc_id)                    AS max_doc_id
FROM assigned
GROUP BY split, lang
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket train/valid/test split (8/1/1) with per-(split, lang)
    size accounting. Assignment is a map-side expression on the same
    multiplicative hash — any row's split can be recomputed independently
    (leak-proof joins between epochs), and the split survives corpus
    repartitioning. The only shuffle is the small accounting aggregate."""
    d = load_table(spark, sf_dir, "documents")
    hv = _h_col() % 10
    split = (
        F.when(hv < SPLIT_BUCKETS[0], "train")
        .when(hv < SPLIT_BUCKETS[0] + SPLIT_BUCKETS[1], "valid")
        .otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


q_sample_bernoulli.__doc__ = q_sample_bernoulli.__doc__.format(pct=SAMPLE_PCT)
