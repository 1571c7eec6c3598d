"""MLlib invariants: LSH library vs HOF implementation agreement, cluster
purity on the labeled fixture, classifier label recovery."""

from __future__ import annotations

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_SMALL


def _run(spark, name):
    return plans.QUERIES[name](spark, SF_SMALL).toPandas()


def test_ml_minhash_agrees_with_hof_on_injected_dups(spark):
    ml_pairs = _run(spark, "ml_minhash_lsh")
    exact_n = len(_run(spark, "dedup_exact"))
    recrawl = ml_pairs[ml_pairs["doc_b"] == ml_pairs["doc_a"] + 100_000]
    # identical texts: jaccard distance exactly 0, every injected pair found
    assert (recrawl["jaccard_dist"] == 0.0).all()
    assert len(recrawl) == exact_n


def test_kmeans_partitions_all_points(spark):
    clusters = _run(spark, "ml_kmeans_clusters")
    # fixture labels are NOT spatial clusters (KMeans purity ~ random, and
    # that is a property of the data, not the operator) — assert structure
    assert clusters["n_points"].sum() == 500
    assert len(clusters) == 10
    assert clusters["purity"].between(0, 1).all()
    assert clusters["majority_label"].between(0, 9).all()


def test_logreg_beats_random_baseline(spark):
    acc = _run(spark, "ml_logreg_accuracy")
    assert acc.loc[0, "n"] == 500
    # 10 balanced classes -> random accuracy ~0.1; the embeddings carry a
    # weak label signal (measured ~0.41 train accuracy)
    assert acc.loc[0, "train_accuracy"] >= 0.25


def test_tfidf_shapes(spark):
    t = _run(spark, "ml_tfidf")
    assert len(t) == 500
    assert (t["tfidf_nnz"] <= t["n_words"]).all()
    assert (t["tfidf_l2"] >= 0).all()
