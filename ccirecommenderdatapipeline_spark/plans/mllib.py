"""MLlib queries (rows-only driver checks — estimator outputs are not
SQL-expressible; invariants live in tests/test_mllib.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.mllib_ops import (
    kmeans_embeddings,
    logreg_label_accuracy,
    minhash_lsh_pairs,
    tfidf_features,
)
from ..operators.text import tokens, with_recrawl, word_ngrams
from ..sources.tables import load_table
from .registry import query


@query("ml_tfidf", oracle=None)
def q_ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF featurization of documents (Tokenizer -> HashingTF -> IDF)."""
    return tfidf_features(load_table(spark, sf_dir, "documents"))


@query("ml_minhash_lsh", oracle=None)
def q_ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library MinHashLSH near-dup pairs (vs the engine-portable HOF
    implementation in dedup_minhash_lsh — tests assert agreement on the
    injected duplicates)."""
    docs = with_recrawl(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.array_distinct(word_ngrams(tokens(F.col("text")), 3)).alias("grams")
    )
    return minhash_lsh_pairs(grams)


@query("ml_kmeans_clusters", oracle=None)
def q_ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans(k=10) over embeddings with per-cluster majority-label purity."""
    return kmeans_embeddings(load_table(spark, sf_dir, "embeddings"))


@query("ml_logreg_accuracy", oracle=None)
def q_ml_logreg_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial logistic regression label recovery on embeddings."""
    return logreg_label_accuracy(load_table(spark, sf_dir, "embeddings"))
