"""MLlib invariants: LSH library vs HOF implementation agreement, cluster
structure on the labeled fixture, classifier label recovery, and the
hashed-vs-exact TF-IDF agreement (VERDICT r10 item 2). Detail-level
checks run on the operators; the registered queries are the reduced
statistic-level forms whose oracles the driver hash-checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark import plans
from ccirecommenderdatapipeline_spark.operators.mllib_ops import (
    kmeans_embeddings,
    minhash_lsh_pairs,
    tfidf_features,
)
from ccirecommenderdatapipeline_spark.operators.text import (
    tokens,
    with_recrawl,
    word_ngrams,
)
from tests.conftest import SF_SMALL


def _run(spark, name):
    return plans.QUERIES[name](spark, SF_SMALL).toPandas()


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_ml_minhash_agrees_with_hof_on_injected_dups(spark):
    docs2 = with_recrawl(_docs(spark))
    grams = docs2.select(
        "doc_id",
        F.array_distinct(word_ngrams(tokens(F.col("text")), 3)).alias("grams"),
    ).filter(F.size("grams") > 0)
    ml_pairs = minhash_lsh_pairs(grams).toPandas()
    exact_n = len(_run(spark, "dedup_exact"))
    recrawl = ml_pairs[ml_pairs["doc_b"] == ml_pairs["doc_a"] + 100_000]
    # identical texts: jaccard distance exactly 0, every injected pair found
    assert (recrawl["jaccard_dist"] == 0.0).all()
    assert len(recrawl) == exact_n


def test_ml_minhash_lsh_summary_invariants(spark):
    s = _run(spark, "ml_minhash_lsh")
    assert len(s) == 1
    row = s.iloc[0]
    assert row["lsh_subset_of_true"]
    assert row["injected_all_found"]
    assert row["recall_ge_090"]
    assert row["n_true_pairs"] >= row["n_injected_pairs"] > 0


def test_kmeans_partitions_all_points(spark):
    clusters = kmeans_embeddings(_emb(spark)).toPandas()
    # fixture labels are NOT spatial clusters (KMeans purity ~ random, and
    # that is a property of the data, not the operator) — assert structure
    assert clusters["n_points"].sum() == 500
    assert len(clusters) == 10
    assert clusters["purity"].between(0, 1).all()
    assert clusters["majority_label"].between(0, 9).all()


def test_ml_kmeans_summary_invariants(spark):
    s = _run(spark, "ml_kmeans_clusters")
    assert len(s) == 1
    row = s.iloc[0]
    assert row["n_points"] == 500
    assert row["k"] == 10
    assert row["n_nonempty_clusters"] == 10
    assert row["inertia_nonincreasing"]


def test_logreg_beats_random_baseline(spark):
    acc = _run(spark, "ml_logreg_accuracy")
    assert acc.loc[0, "n"] == 500
    assert acc.loc[0, "n_classes"] == 10
    # 10 balanced classes -> random accuracy ~0.1; measured 0.22-0.45
    assert acc.loc[0, "acc_above_random"]


def test_tfidf_shapes(spark):
    t = tfidf_features(_docs(spark)).toPandas()
    assert len(t) == 500
    assert (t["tfidf_nnz"] <= t["n_words"]).all()
    assert (t["tfidf_l2"] >= 0).all()
    q = _run(spark, "ml_tfidf")
    assert q["nnz_le_words"].all()
    assert q["max_le_l2"].all()


def test_tfidf_hashed_tracks_exact_twin(spark):
    """HashingTF(4096)+IDF per-doc l2 norms track the EXACT (unhashed)
    tf-idf l2 norms computed with the same idf formula ln((N+1)/(df+1))
    over the same whitespace tokens — hash collisions only merge a few
    terms per doc, so the correlation must stay near 1 (the ml_tfidf vs
    tfidf_sql cross-check, VERDICT r10 item 2)."""
    ml = tfidf_features(_docs(spark)).toPandas().set_index("doc_id")
    docs = _docs(spark).select("doc_id", "text").toPandas()
    n_docs = len(docs)
    toks = {
        r.doc_id: [t for t in r.text.lower().split() if t]
        for r in docs.itertuples()
    }
    df_counts: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df_counts[t] = df_counts.get(t, 0) + 1
    exact_l2 = {}
    for doc_id, ts in toks.items():
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        exact_l2[doc_id] = math.sqrt(
            sum(
                (c * math.log((n_docs + 1) / (df_counts[t] + 1))) ** 2
                for t, c in tf.items()
            )
        )
    import pandas as pd

    pair = pd.DataFrame(
        {
            "ml": ml["tfidf_l2"],
            "exact": pd.Series(exact_l2),
        }
    ).dropna()
    assert len(pair) == n_docs
    corr = pair["ml"].corr(pair["exact"])
    assert corr > 0.95, f"hashed tf-idf diverged from exact twin: corr={corr}"


def test_mllib_construction_contract(spark):
    """VERDICT r12 item 5: the eager-at-construction contract is
    intentional and pinned. q_ml_minhash_lsh's RETURNED plan is a 1-row
    local relation (all work happened while building it); its prefold
    companion exposes the real lazy subtree (joins/aggs, NOT local) so
    the fingerprint gate sees structure; and the prefold's verdict
    counts are the exact numbers the eager query folded in."""
    from ccirecommenderdatapipeline_spark.plans.mllib import (
        ml_minhash_lsh_prefold,
    )

    eager = plans.QUERIES["ml_minhash_lsh"](spark, SF_SMALL)
    eager_plan = eager._jdf.queryExecution().executedPlan().toString()
    # returned relation is local: no scans, joins, or exchanges left
    for node in ("FileScan", "Exchange", "Join"):
        assert node not in eager_plan, (
            f"ml_minhash_lsh's returned plan grew a {node} — the "
            "eager-local-result contract (and the prefold fingerprint "
            "design) no longer holds"
        )

    prefold = ml_minhash_lsh_prefold(spark, SF_SMALL)
    prefold_plan = prefold._jdf.queryExecution().executedPlan().toString()
    assert "Join" in prefold_plan and "Exchange" in prefold_plan, (
        "prefold subtree lost its structure — fingerprinting it no "
        "longer carries drift signal"
    )

    # prefold computes the same verdicts the eager query folded
    v = prefold.first()
    row = eager.first()
    assert row["n_true_pairs"] == v["n_true"]
    assert row["lsh_subset_of_true"] == (v["n_only_lsh"] == 0)
    spark.catalog.clearCache()
