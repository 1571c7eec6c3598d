"""Round-3 additions: TPC-H classics, event analytics, corpus prep.

The oracle gate (tools/check_oracle.py) pins cross-engine value equality;
these tests pin structural invariants the oracles can't see — plan shape
(pushdown, broadcast), reconstruction properties, and interval algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_MED


def _q(spark, name, sf=SF_MED):
    return plans.QUERIES[name](spark, sf)


# --- TPC-H ------------------------------------------------------------------

def test_tpch_q1_scan_pushdown(spark):
    plan = _q(spark, "tpch_q1")._jdf.queryExecution().executedPlan().toString()
    # filter reaches the parquet scan; projection is pruned to used columns
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_tpch_q3_top20(spark):
    rows = _q(spark, "tpch_q3").collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_tpch_q5_broadcasts_dimension_chain(spark):
    plan = _q(spark, "tpch_q5")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- event analytics --------------------------------------------------------

def test_funnel_stages_are_ordered(spark):
    df = _q(spark, "funnel_analysis")
    bad = df.filter(
        (F.col("click_us").isNotNull() & (F.col("click_us") <= F.col("view_us")))
        | (F.col("purchase_us").isNotNull() & (F.col("purchase_us") <= F.col("click_us")))
    )
    assert bad.count() == 0
    # stage k implies stage k-1 reached
    assert df.filter((F.col("stage") >= 2) & F.col("click_us").isNull()).count() == 0
    assert df.filter((F.col("stage") == 3) & F.col("purchase_us").isNull()).count() == 0


def test_retention_cohort_offsets_start_at_zero(spark):
    df = _q(spark, "retention_cohorts")
    # every cohort has an offset-0 cell (the user's first week is active)
    cohorts = {r.cohort_week for r in df.select("cohort_week").distinct().collect()}
    zero = {r.cohort_week for r in df.filter("week_offset = 0").collect()}
    assert cohorts == zero
    assert df.filter("week_offset < 0").count() == 0


def test_rollup_matches_direct_daily(spark):
    from ccirecommenderdatapipeline_spark.plans.events import _events, _sum_dec

    rolled = _q(spark, "rollup_multires").select("day", "n_events", "sum_value")
    direct = (
        _events(spark, SF_MED)
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            _sum_dec().cast("double").alias("sum_value"),
        )
    )
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0


def test_scd2_intervals_partition_timeline(spark):
    df = _q(spark, "scd2_dimension")
    # exactly one current row per user; versions are 1..n contiguous;
    # each non-current interval ends where the next begins
    per_user = df.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count("*").alias("n"),
        F.max("version").alias("max_v"),
    )
    assert per_user.filter("n_current <> 1 OR max_v <> n").count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    chained = df.withColumn("next_from", F.lead("valid_from_us").over(w))
    assert chained.filter(
        F.col("next_from").isNotNull() & (F.col("valid_to_us") != F.col("next_from"))
    ).count() == 0


def test_heavy_hitters_shares(spark):
    df = _q(spark, "heavy_hitters")
    assert df.filter("rnk > 3 OR rnk < 1").count() == 0
    assert df.filter("share <= 0 OR share > 1").count() == 0


# --- corpus prep ------------------------------------------------------------

def test_chunks_reassemble_exactly(spark):
    # stride-96 prefixes of each 128-char chunk concatenate back to the text
    from ccirecommenderdatapipeline_spark.plans.corpus import CHUNK_STRIDE

    docs = plans.QUERIES["doc_chunking"](spark, SF_MED)
    rebuilt = (
        docs.withColumn("piece", F.expr(f"substring(chunk_text, 1, {CHUNK_STRIDE})"))
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("chunk_id", "piece")))
             .getField("piece")).alias("rebuilt"))
    )
    orig = spark.read.parquet(f"{SF_MED}/documents.parquet").select("doc_id", "text")
    joined = rebuilt.join(orig, "doc_id")
    assert joined.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_packing_conserves_tokens_and_orders_bins(spark):
    df = _q(spark, "sequence_packing")
    assert df.filter("first_bin > last_bin").count() == 0
    assert df.filter("n_tokens <= 0").count() == 0
    # offsets tile the stream: next doc starts where the previous ended
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    tiled = df.withColumn("prev_end", F.lag(F.col("start_tok") + F.col("n_tokens")).over(w))
    assert tiled.filter(
        F.col("prev_end").isNotNull() & (F.col("start_tok") != F.col("prev_end"))
    ).count() == 0


def test_contamination_excludes_benchmark_docs(spark):
    df = _q(spark, "contamination_check")
    assert df.filter("doc_id % 100 = 0").count() == 0
    assert df.filter("n_shared_grams < 1").count() == 0


def test_bm25_scores_descend(spark):
    rows = _q(spark, "bm25_search").collect()
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.n_terms_hit >= 1 for r in rows)


# --- late round-3 additions -------------------------------------------------

def test_pagerank_mass_conserved_modulo_dangling(spark):
    rows = _q(spark, "pagerank_bipartite").collect()
    total = sum(r.rank for r in rows)
    assert all(r.rank > 0 for r in rows)
    # teleport mass is exact; dangling leakage only ever removes mass
    assert 0.5 < total <= 1.0 + 1e-9


def test_salted_join_no_broadcast_on_salted_side(spark):
    plan = _q(spark, "salted_join")._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan


def test_hierarchy_depth_matches_decimal_shift(spark):
    df = _q(spark, "hierarchy_walk")
    import pyspark.sql.functions as F

    bad = df.filter(
        F.col("depth") != (F.length(F.col("c_custkey").cast("string")) - 1)
    )
    assert bad.count() == 0


def test_media_dedup_canonical_is_original(spark):
    df = _q(spark, "media_dedup")
    assert df.filter("canonical_id >= 100000").count() == 0
    assert df.filter("n_copies < 2").count() == 0


def test_shared_subtrees_are_plan_match_cacheable(spark):
    # The round-3 perf fix: literal grids must canonicalize by VALUE so the
    # persisted shared subtrees (cci_view / agged_view / agged_years_view)
    # plan-match across reconstructions. createDataFrame literals break
    # this silently (RDD-identity canonicalization) — pin sameResult.
    from ccirecommenderdatapipeline_spark.plans.simulator import (
        agged_view,
        agged_years_view,
    )
    from tests.conftest import SF_SMALL

    for view in (agged_view, agged_years_view):
        a = view(spark, SF_SMALL)._jdf.queryExecution().analyzed()
        b = view(spark, SF_SMALL)._jdf.queryExecution().analyzed()
        assert a.sameResult(b), f"{view.__name__} not plan-match cacheable"
