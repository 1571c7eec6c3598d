"""Corpus-quality battery: gate composition + determinism invariants."""

from __future__ import annotations

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_SMALL


def test_filtered_corpus_is_subset_of_gates(spark):
    gates = plans.QUERIES["quality_gopher"](spark, SF_SMALL).toPandas()
    rep = plans.QUERIES["repetition_ratios"](spark, SF_SMALL).toPandas()
    filtered = plans.QUERIES["quality_filtered_corpus"](spark, SF_SMALL).toPandas()

    passing = set(gates[gates["passes"]]["doc_id"])
    non_rep = set(rep[~rep["repetitive"]]["doc_id"])
    survivors = set(filtered["doc_id"])
    assert survivors <= passing
    assert survivors <= non_rep
    # the filter must actually discriminate on this fixture
    assert 0 < len(survivors) < len(gates)


def test_corpus_mix_probs_sum_to_one(spark):
    mix = plans.QUERIES["corpus_mix"](spark, SF_SMALL).toPandas()
    assert abs(mix["prob"].sum() - 1.0) < 1e-12
    assert (mix["target_docs"] <= mix["prob"] * 10_000).all()
    # deterministic across runs (sqrt weights + pinned fold order)
    again = plans.QUERIES["corpus_mix"](spark, SF_SMALL).toPandas()
    merged = mix.merge(again, on="source", suffixes=("_a", "_b"))
    assert (merged["prob_a"] == merged["prob_b"]).all()


def test_pii_scrub_redacts_everything_seeded(spark):
    out = plans.QUERIES["pii_scrub"](spark, SF_SMALL).toPandas()
    seeded = out[out["doc_id"] % 4 != 3]
    assert seeded["redacted"].all()
    assert (seeded[["n_emails", "n_phones", "n_ids"]].sum(axis=1) == 1).all()
    untouched = out[out["doc_id"] % 4 == 3]
    assert not untouched["redacted"].any()


def test_quality_logreg_score_replay(spark):
    """Pure-Python replay of the frozen classifier on sf0.001: the decision
    bit must come from the exact logit (never the rounded sigmoid)."""
    import math
    import re

    from ccirecommenderdatapipeline_spark.plans.quality import (
        LOGREG_W,
        q_quality_logreg_score,
    )

    got = {
        r["doc_id"]: (r["logit"], r["score"], r["predicted_keep"])
        for r in q_quality_logreg_score(spark, "/root/testdata/sf0.001").collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").collect()
    for r in docs:
        toks = [t for t in re.sub("[^a-z]+", " ", r["text"].lower()).split(" ") if t]
        alpha = len(re.sub("[^a-zA-Z]", "", r["text"])) / len(r["text"])
        stop = len([t for t in toks if t in ("the", "a", "of", "and")]) / len(toks)
        avg_len = sum(len(t) for t in toks) / len(toks)
        z = round(
            LOGREG_W["bias"]
            + LOGREG_W["tokens_per_100"] * (len(toks) / 100.0)
            + LOGREG_W["alpha_ratio"] * alpha
            + LOGREG_W["stopword_ratio"] * stop
            + LOGREG_W["avg_token_len"] * avg_len,
            6,
        )
        want = (z, round(1.0 / (1.0 + math.exp(-z)), 4), z > 0)
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_hll_distinct_error_bound(spark):
    from ccirecommenderdatapipeline_spark import plans
    from tests.conftest import SF_MED

    row = plans.QUERIES["hll_distinct"](spark, SF_MED).collect()[0]
    # m=256 gives ~1.04/sqrt(m) = 6.5% expected std error; allow 3 sigma
    assert row["m"] == 256
    assert row["n_exact"] > 1000  # trigram population is sketch-sized
    assert row["rel_err"] == round(
        abs(row["n_hll"] - row["n_exact"]) / row["n_exact"], 4
    )
    assert row["rel_err"] < 0.20


def test_bloom_membership_no_false_negatives(spark):
    from ccirecommenderdatapipeline_spark import plans
    from tests.conftest import SF_MED

    row = plans.QUERIES["bloom_membership"](spark, SF_MED).collect()[0]
    # a bloom filter can never produce a false negative: every true member
    # must probe positive, so positives >= members and fp = pos - members
    assert row["n_positive"] >= row["n_members"]
    assert row["n_false_pos"] == row["n_positive"] - row["n_members"]
    assert 0.0 <= row["fp_rate"] < 0.5  # m/n ~ 6.6, k=3 -> ~5% expected


def test_hll_merge_equals_global_sketch(spark):
    from ccirecommenderdatapipeline_spark import plans
    from tests.conftest import SF_MED

    rows = plans.QUERIES["hll_merge_sources"](spark, SF_MED).collect()
    merged = [r["n_hll"] for r in rows if r["source"] == "__merged__"]
    assert len(merged) == 1
    glob = plans.QUERIES["hll_distinct"](spark, SF_MED).collect()[0]["n_hll"]
    # max-merge of per-source registers must reproduce the global sketch
    # EXACTLY (register-level identity, not just approximate agreement)
    assert merged[0] == glob
