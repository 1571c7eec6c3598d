"""Plan-size audit contract (VERDICT r13 item 4).

The r13 pca inlining bug — every downstream reference to an un-persisted
shared subtree re-inlines the whole covariance tree, so OPTIMIZE+CODEGEN
time dominated the query — was found by a bench-cell anomaly (the sf0.01
cell was BIGGER than sf0.1), not by tools/audit_plans.py. The audit now
counts EXECUTABLE nodes (AQE-unwrapped, truncated at InMemoryTableScan)
and flags plans past PLAN_NODE_BUDGET. These tests plant exactly that
regression — building pca_power_iteration with persist() no-op'd — and
pin that (a) the planted shape trips the flag and (b) the real shape and
the rest of the registry stay far under budget (the full-registry sweep
is the audit's own run; here the two largest known plans stand in).
"""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

from audit_plans import PLAN_NODE_BUDGET, _executable_nodes  # noqa: E402

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_SMALL


def _nodes(df) -> int:
    return _executable_nodes(df._jdf.queryExecution().executedPlan())


def test_planted_inlined_subtree_trips_budget(spark, monkeypatch):
    """Reverting the pca plan-size persists must re-create the r13 bug
    shape and blow the budget — if this stops tripping, the audit signal
    (executable nodes, not plan text) has regressed."""
    import pyspark.sql.classic.dataframe as cd

    monkeypatch.setattr(
        cd.DataFrame, "persist", lambda self, *a, **k: self
    )
    spark.catalog.clearCache()
    try:
        planted = _nodes(plans.QUERIES["pca_power_iteration"](spark, SF_SMALL))
    finally:
        spark.catalog.clearCache()
    assert planted > PLAN_NODE_BUDGET, (
        f"planted no-persist pca measures {planted} executable nodes — "
        f"expected the r13 inlined-subtree shape (>{PLAN_NODE_BUDGET}); "
        "either the query got structurally smaller (update this pin) or "
        "_executable_nodes stopped descending the real tree"
    )


def test_real_plans_stay_under_budget(spark):
    """The fixed pca shape and the largest legitimate registered plans
    sit far below budget — headroom is the point: a legit refactor should
    never brush the threshold."""
    spark.catalog.clearCache()
    for name in ("pca_power_iteration", "corpus_pipeline",
                 "markov_stationary"):
        got = _nodes(plans.QUERIES[name](spark, SF_SMALL))
        assert got <= PLAN_NODE_BUDGET // 2, (
            f"{name} measures {got} executable nodes — over half the "
            f"audit budget ({PLAN_NODE_BUDGET}); either a shared subtree "
            "lost its persist or the budget needs re-derivation"
        )
        spark.catalog.clearCache()


def test_imts_truncation_is_the_signal(spark):
    """The budget only works because InMemoryTableScan truncates the
    count (text-level counts are identical for the fixed and broken
    shapes). Pin that the fixed pca plan actually carries IMTS nodes —
    if cache substitution stops applying at build time, the audit would
    silently measure the inlined tree for everyone."""
    spark.catalog.clearCache()
    df = plans.QUERIES["pca_power_iteration"](spark, SF_SMALL)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in txt
    spark.catalog.clearCache()


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
