"""Bucketing demonstration (SURVEY §7.8 scaling passes): two tables bucketed
by symbol join WITHOUT a shuffle — the layout that makes every per-symbol
join/window in the daily pipeline exchange-free at 100 TB.

Lives as a test (not a driver-contract query) because bucketing metadata
needs a session-lifetime catalog; the properties asserted are the plan shape
(no Exchange) and result equality with the plain join.
"""

from __future__ import annotations

import contextlib
import io
import shutil

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark.sources.prices import prices_view
from tests.conftest import SF_SMALL


def test_bucketed_join_is_shuffle_free(spark):
    prices = prices_view(spark, SF_SMALL)
    stats = prices.groupBy("symbol").agg(
        F.avg("close_pr").alias("avg_close"), F.count("*").alias("n_days")
    )
    for name, df in [("b_prices", prices), ("b_stats", stats)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # the in-memory catalog forgets tables between sessions but their
        # files survive -> clear the location or saveAsTable refuses
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(8, "symbol")
            .sortBy("symbol")
            .saveAsTable(name)
        )

    # force the sort-merge path (the fixture's stats side is small enough to
    # auto-broadcast, which would hide the bucketing) — at real scale both
    # sides are large and SMJ is what the planner picks anyway
    joined = spark.table("b_prices").hint("merge").join(spark.table("b_stats"), "symbol")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # co-located bucketed join: a join with NO shuffle on either side
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan

    plain = prices.join(stats, "symbol")
    assert joined.count() == plain.count()
    got = joined.agg(F.sum("n_days"), F.round(F.sum("close_pr"), 2)).first()
    exp = plain.agg(F.sum("n_days"), F.round(F.sum("close_pr"), 2)).first()
    assert got == exp
