"""End-to-end daily batch (E1+E2+E3): every stage table written, readable,
and mutually consistent."""

from __future__ import annotations

import tempfile

from ccirecommenderdatapipeline_spark.pipeline import run_daily_batch
from tests.conftest import SF_SMALL


def test_daily_batch_end_to_end(spark):
    out = tempfile.mkdtemp()
    counts = run_daily_batch(spark, SF_SMALL, out)

    assert counts["symbol_list"] > 0
    assert counts["prices"] > counts["cci"] * 0 and counts["prices"] == counts["cci"]
    # one best row per symbol-with-trades, identical across the 3 criteria
    assert (
        counts["best_win"]
        == counts["best_return"]
        == counts["best_return_per_days_held"]
        > 0
    )
    # reco/candidates are subsets of the symbols with best rows
    assert counts["reco_revenue"] <= counts["best_return"]
    assert counts["buy_candidates"] <= 20
    assert counts["sell_decisions"] > 0
    assert counts["order_reconciliation"] > 0

    # idempotence: a rerun overwrites to the same counts (S13 semantics)
    assert run_daily_batch(spark, SF_SMALL, out) == counts


def test_registry_contract_integrity():
    """Driver-contract invariants: every oracle belongs to a registered
    query, names are stable identifiers, and the 50-query driver window is
    exactly filled by the priority list (a short _PRIORITY silently wastes
    verdict slots; an over-long one silently drops names)."""
    from ccirecommenderdatapipeline_spark.plans import ORACLES, QUERIES, _PRIORITY

    assert set(ORACLES) <= set(QUERIES)
    assert all(n.isidentifier() for n in QUERIES)
    window = list(QUERIES)[:50]
    in_registry = [n for n in _PRIORITY if n in QUERIES]
    assert window == in_registry[:50]
    assert len(in_registry) == 50, (
        f"_PRIORITY covers {len(in_registry)} of the 50 driver slots"
    )
    # rows-only class retired r11 (VERDICT r10 item 2): the 4 MLlib
    # wrappers now carry statistic-level oracles, so EVERY registered
    # query is oracle-backed and any future oracle=None registration
    # must re-justify itself here
    from ccirecommenderdatapipeline_spark.plans.registry import (
        ROWS_ONLY_REASONS,
    )

    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == set()
    assert rows_only == set(ROWS_ONLY_REASONS)
    # the driver window must contain only oracle-bearing names — a
    # rows-only op in the window surfaces as a phantom `err: no_oracle`
    # CORRECTNESS row (seen r06; structurally excluded since r9)
    assert not (set(window) & rows_only), (
        f"rows-only ops in the driver window: {set(window) & rows_only}"
    )
