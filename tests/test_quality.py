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
