"""MLlib feature-engineering + modeling over the fixture tables — the
"DataFrame transformations + MLlib" surface (BASELINE.json spark_approach).

Everything is seeded and deterministic; outputs are plain columns (no
VectorUDT leaves these functions) so results flow through the driver
contract like any relational query. ML estimator outputs have no SQL
oracles — invariants are pinned by tests/test_mllib.py (cluster purity,
classifier accuracy, LSH-vs-HOF dedup agreement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEED = 42


def tfidf_features(docs: DataFrame, n_features: int = 1 << 12) -> DataFrame:
    """RegexTokenizer -> HashingTF -> IDF; emits per-doc sparse-vector
    summary stats (nnz, l2 norm, max weight) as plain doubles.

    RegexTokenizer (pattern ``\\s+``, minTokenLength=1) rather than the
    plain Tokenizer: Java's ``split("\\s")`` keeps interior empty tokens
    on consecutive whitespace, so its token COUNT is not restatable as
    SQL; the regex form's count is exactly
    ``len(list_filter(string_split_regex(text,'\\s+'), t -> len(t)>=1))``
    in DuckDB — which is what makes ``ml_tfidf``'s n_words column
    oracle-checkable (verified 0 mismatches at sf0.001/0.01/0.1)."""
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    from pyspark.ml.functions import vector_to_array

    tok = RegexTokenizer(
        inputCol="text", outputCol="words", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=n_features)
    words = tok.transform(docs.select("doc_id", "text"))
    tfed = tf.transform(words)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tfed)
    out = idf.transform(tfed)

    # Vector summary stats via vector_to_array + Catalyst HOFs — stays
    # JVM-side/codegen (no Python in the per-row path). nnz counts strictly
    # non-zero weights (a stored entry whose idf is 0 — term in every doc —
    # is not "non-zero"); l2/max are unaffected by zero entries.
    vals = F.filter(vector_to_array(F.col("tfidf")), lambda x: x != 0.0)
    return out.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.size(vals).cast("long").alias("tfidf_nnz"),
        F.sqrt(F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x * x)).alias("tfidf_l2"),
        F.coalesce(F.array_max(vals), F.lit(0.0)).alias("tfidf_max"),
    )


def derived_vocab_size(n_grams: int | None) -> int:
    """The one headroom rule for CountVectorizer vocab sizing: 2x the
    measured distinct-gram count, floored at the 2^18 library default.
    Kept as THE single definition — ADVICE r11 item 4 traced a silent
    correctness dependency to the default cap, and a caller re-deriving
    its own formula could drift from the helper's on one path only."""
    return max(1 << 18, 2 * int(n_grams or 0))


def minhash_lsh_pairs(
    docs_with_grams: DataFrame,
    threshold: float = 0.5,
    vocab_size: int | None = None,
) -> DataFrame:
    """ml.feature.MinHashLSH near-dup pairs over binary shingle vectors —
    the library counterpart of the HOF MinHash in operators/text.py (tests
    assert both catch the same injected duplicates). Input: (doc_id, grams
    array<string>) with non-empty grams.

    ``vocab_size`` MUST cover every distinct gram: CountVectorizer's
    default cap (2^18) silently drops rare grams once the vocabulary
    exceeds it, which re-weights the key jaccard distance and breaks the
    "LSH pairs are a subset of exact-jaccard pairs" invariant at larger
    corpora (ADVICE r11 item 4). When None, one count-distinct pass over
    the grams derives it with 2x headroom (floored at the 2^18 default)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    if vocab_size is None:
        n_grams = (
            docs_with_grams.select(F.explode("grams").alias("g"))
            .agg(F.countDistinct("g"))
            .first()[0]
        )
        vocab_size = derived_vocab_size(n_grams)
    cv = CountVectorizer(
        inputCol="grams", outputCol="features", binary=True, vocabSize=vocab_size
    ).fit(docs_with_grams)
    feat = cv.transform(docs_with_grams).filter(
        F.size("grams") > 0  # MinHashLSH requires >=1 non-zero entry
    )
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            "jaccard_dist",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def kmeans_fit(emb: DataFrame, k: int = 10, max_iter: int = 20):
    """Fit KMeans(seed=SEED, maxIter=max_iter) on the embedding column;
    returns (model, vecs). maxIter=20 is Spark's own default, pinned
    explicitly so callers can reuse ONE fitted model for both the cluster
    assignment and the converged-cost probe (ADVICE r11 item 5: the old
    separate inertia helper re-fit the same model twice more at
    plan-construction time)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=k, seed=SEED, maxIter=max_iter, featuresCol="features").fit(vecs)
    return model, vecs


def kmeans_embeddings(emb: DataFrame, k: int = 10, fitted=None) -> DataFrame:
    """KMeans over the embedding column; emits per-cluster size and the
    majority fixture label with its share (clustering quality signal).
    Pass ``fitted=(model, vecs)`` from kmeans_fit to reuse a model."""
    model, vecs = fitted if fitted is not None else kmeans_fit(emb, k)
    pred = model.transform(vecs)
    counts = pred.groupBy("prediction", "label").count()
    from pyspark.sql import Window

    w = Window.partitionBy("prediction").orderBy(F.desc("count"), F.asc("label"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.sum("count").over(Window.partitionBy("prediction")))
        .filter(F.col("rn") == 1)
        .select(
            F.col("prediction").alias("cluster"),
            F.col("cluster_size").cast("long").alias("n_points"),
            F.col("label").alias("majority_label"),
            (F.col("count") / F.col("cluster_size")).alias("purity"),
        )
    )


def kmeans_cost1(vecs, k: int = 10) -> float:
    """trainingCost after exactly 1 Lloyd iteration (same seed/init as
    kmeans_fit) — the other half of the descent invariant cost20 <= cost1
    that ml_kmeans_clusters pins as a boolean. One scalar summary read, a
    bounded control-flow probe (the graph.py:501 class), not a data
    collect; cost20 comes from the caller's already-fitted maxIter=20
    model, so the probe adds ONE extra fit, not two."""
    from pyspark.ml.clustering import KMeans

    return (
        KMeans(k=k, seed=SEED, maxIter=1, featuresCol="features")
        .fit(vecs)
        .summary.trainingCost
    )


def logreg_label_accuracy(emb: DataFrame) -> DataFrame:
    """Multinomial logistic regression label-recovery on the embeddings:
    one output row with train accuracy (the clusters are separable by
    construction, so accuracy is a correctness probe, not a benchmark)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding")).alias("features"),
    )
    model = LogisticRegression(maxIter=50, regParam=0.01).fit(vecs)
    pred = model.transform(vecs)
    return pred.agg(
        F.count("*").cast("long").alias("n"),
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias("train_accuracy"),
    )
