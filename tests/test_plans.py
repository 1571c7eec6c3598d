"""Physical-plan regression tests: the scale properties claimed in
docstrings (pushdown, pruning, broadcast) must actually appear in the
optimized plans — a wrong refactor can silently lose them."""

from __future__ import annotations

import contextlib
import io

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_SMALL


def _explain(spark, name: str) -> str:
    df = plans.QUERIES[name](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_prices_scan_prunes_columns(spark):
    txt = _explain(spark, "prices")
    # only the 6 needed lineitem columns reach the parquet reader
    assert "l_suppkey" in txt
    assert "l_orderkey" not in txt
    assert "l_partkey" not in txt


def test_centroid_filter_is_pushed_down(spark):
    txt = _explain(spark, "knn_ivf")
    assert "LessThan(vec_id,16)" in txt  # reaches the parquet scan
    assert "PushedFilters" in txt
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin" not in txt


def test_simulator_grid_is_broadcast(spark):
    txt = _explain(spark, "trades_sim")
    # the combos grid joins as a broadcast nested loop, never a shuffle join
    assert "BroadcastNestedLoopJoin" in txt
    assert "SortMergeJoin" not in txt


def test_lookup_join_is_broadcast(spark):
    txt = _explain(spark, "lookup_join")
    assert "BroadcastHashJoin" in txt
