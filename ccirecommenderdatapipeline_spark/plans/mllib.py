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


@query(
    "ml_tfidf",
    oracle=None,
    rows_only_reason=(
        "HashingTF buckets terms with 32-bit MurmurHash3 and IDF applies "
        "an UNROUNDED Math.log inside the estimator — neither Spark's "
        "murmur3 nor bit-identical ln is expressible in DuckDB SQL, and "
        "the repo's determinism bar (round transcendentals BEFORE use, "
        "LOGP_DP idiom) cannot be applied inside a library estimator. "
        "Invariants pinned in tests/test_mllib.py"
    ),
)
def q_ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF featurization of documents (Tokenizer -> HashingTF -> IDF)."""
    return tfidf_features(load_table(spark, sf_dir, "documents"))


@query(
    "ml_minhash_lsh",
    oracle=None,
    rows_only_reason=(
        "MinHashLSH draws its (a,b) hash coefficients from a seeded JVM "
        "RNG and CountVectorizer's vocabulary index assignment is "
        "tie-order-dependent — neither is reproducible from DuckDB SQL "
        "over the raw tables. Agreement with the engine-portable HOF "
        "MinHash (which HAS a full oracle, dedup_minhash_lsh) is pinned "
        "in tests/test_mllib.py"
    ),
)
def q_ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library MinHashLSH near-dup pairs (vs the engine-portable HOF
    implementation in dedup_minhash_lsh — tests assert agreement on the
    injected duplicates)."""
    docs = with_recrawl(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.array_distinct(word_ngrams(tokens(F.col("text")), 3)).alias("grams")
    )
    return minhash_lsh_pairs(grams)


@query(
    "ml_kmeans_clusters",
    oracle=None,
    rows_only_reason=(
        "KMeans is an iterative optimizer whose result depends on "
        "seeded k-means|| initialization and FP summation order inside "
        "MLlib — not a deterministic function of the tables that SQL "
        "could restate. Purity/size invariants pinned in "
        "tests/test_mllib.py"
    ),
)
def q_ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans(k=10) over embeddings with per-cluster majority-label purity."""
    return kmeans_embeddings(load_table(spark, sf_dir, "embeddings"))


@query(
    "ml_logreg_accuracy",
    oracle=None,
    rows_only_reason=(
        "L-BFGS logistic regression converges through FP-order-dependent "
        "gradient aggregation; the fitted coefficients (hence train "
        "accuracy) are not restatable as SQL over the tables. Accuracy "
        "floor pinned in tests/test_mllib.py"
    ),
)
def q_ml_logreg_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial logistic regression label recovery on embeddings."""
    return logreg_label_accuracy(load_table(spark, sf_dir, "embeddings"))
