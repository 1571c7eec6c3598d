"""Dedup-suite invariants: every injected recrawl duplicate must be caught by
each near-dup method at full similarity, and exact dedup must pair-group all
of them."""

from __future__ import annotations

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_SMALL


def _run(spark, name):
    return plans.QUERIES[name](spark, SF_SMALL).toPandas()


def test_exact_dedup_groups_all_recrawls(spark):
    g = _run(spark, "dedup_exact")
    # every text exists exactly twice (original + recrawl), canonical = original
    assert (g["n_copies"] == 2).all()
    assert (g["max_doc_id"] == g["canonical_doc_id"] + 100_000).all()


def test_near_dup_methods_catch_recrawl_pairs(spark):
    for name, sim_col in [
        ("dedup_ngram_jaccard", "jaccard"),
        ("dedup_minhash_lsh", "est_jaccard"),
    ]:
        pairs = _run(spark, name)
        recrawl = pairs[pairs["doc_b"] == pairs["doc_a"] + 100_000]
        # identical texts -> similarity exactly 1.0, and none missed
        assert (recrawl[sim_col] == 1.0).all(), name
        exact = _run(spark, "dedup_exact")
        assert len(recrawl) == len(exact), name


def test_fingerprints_cluster_identical_texts(spark):
    fp = _run(spark, "doc_fingerprints")
    assert (fp["n_sharing"] >= 2).all()
    sim = _run(spark, "simhash_groups")
    # every identical-text pair collides in simhash (plus possible extras)
    assert (sim["n_docs"] >= 2).all()
    assert len(sim) > 0


def test_lang_id_deterministic_tiebreak(spark):
    lid = _run(spark, "lang_id")
    assert set(lid["predicted_lang"].unique()) <= {"de", "en", "es", "fr", "und"}
    scores = lid[["de_score", "en_score", "es_score", "fr_score"]]
    best = scores.max(axis=1)
    und = lid["predicted_lang"] == "und"
    assert (best[und] == 0).all()


def test_simhash_hamming_pairs(spark):
    from ccirecommenderdatapipeline_spark.plans.text import SIMHASH_MAX_HAMMING

    pairs = _run(spark, "dedup_simhash_hamming")
    # verification bound holds and pairs are canonical + unique
    assert (pairs["hamming"] >= 0).all()
    assert (pairs["hamming"] <= SIMHASH_MAX_HAMMING).all()
    assert (pairs["doc_a"] < pairs["doc_b"]).all()
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()
    # recrawl twins share an identical fingerprint -> hamming 0; every twin
    # pair that survives the hub-bucket cap must be reported
    twins = pairs[pairs["doc_b"] == pairs["doc_a"] + 100_000]
    assert len(twins) > 0
    assert (twins["hamming"] == 0).all()
