"""Invariants for the co-occurrence / training-step round-7 additions:
market-basket support algebra, cosine neighbor-list shape, gradient-step
replay against a pure-Python fold, and padding-waste accounting."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark.plans.corpus import (
    LBB_STEP,
    q_length_bucket_batching,
)
from ccirecommenderdatapipeline_spark.plans.recommender import (
    MIN_SUPPORT,
    TOP_NEIGHBORS,
    _order_brands,
    q_item_item_cosine,
    q_market_basket_pairs,
)
from ccirecommenderdatapipeline_spark.plans.training import (
    GD_LR,
    GD_W,
    q_logreg_gd_step,
)
from tests.conftest import SF_SMALL


def test_market_basket_support_algebra(spark):
    """support = pair_cnt / n_orders exactly; every pair clears the
    fractional threshold; lift = support / (supp_a * supp_b)."""
    rows = q_market_basket_pairs(spark, SF_SMALL).collect()
    assert rows, "threshold filtered everything out at sf0.001"
    ob = _order_brands(spark, SF_SMALL)
    n_orders = ob.select("ok").distinct().count()
    brand_c = {r["brand"]: r["c"] for r in ob.groupBy("brand").count().withColumnRenamed("count", "c").collect()}
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["support"] >= MIN_SUPPORT
        assert r["support"] == round(r["pair_cnt"] / n_orders, 8)
        assert r["conf_a_to_b"] == round(r["pair_cnt"] / brand_c[r["brand_a"]], 8)
        lift = (r["pair_cnt"] * n_orders) / (
            brand_c[r["brand_a"]] * brand_c[r["brand_b"]]
        )
        assert r["lift"] == round(lift, 8)


def test_item_item_cosine_neighbor_lists(spark):
    """<= TOP_NEIGHBORS rows per brand, rnk dense from 1, cosine in (0, 1],
    non-increasing down each neighbor list."""
    rows = q_item_item_cosine(spark, SF_SMALL).collect()
    by_a = defaultdict(list)
    for r in rows:
        by_a[r["brand_a"]].append(r)
    assert by_a, "no neighbor lists produced"
    for a, lst in by_a.items():
        lst.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= TOP_NEIGHBORS
        assert all(0.0 < r["cosine"] <= 1.0 for r in lst)
        assert all(
            lst[i]["cosine"] >= lst[i + 1]["cosine"] for i in range(len(lst) - 1)
        )
        assert all(r["brand_b"] != a for r in lst)


def test_logreg_gd_step_matches_python_fold(spark):
    """Replay the gradient with a pure-Python loop over the same rows using
    the documented rounding schedule; weights must match to 8dp."""
    got = {r["feature"]: r for r in q_logreg_gd_step(spark, SF_SMALL).collect()}
    assert set(got) == {"bias", "f_acctbal", "f_nation"}
    cust = (
        spark.read.parquet(f"{SF_SMALL}/customer.parquet")
        .select("c_acctbal", "c_nationkey", "c_mktsegment")
        .collect()
    )
    sums = {"bias": 0.0, "f_acctbal": 0.0, "f_nation": 0.0}
    nll = 0.0
    for r in cust:
        f1, f2 = r["c_acctbal"] / 10000.0, r["c_nationkey"] / 25.0
        y = 1 if r["c_mktsegment"] == "BUILDING" else 0
        z = round(GD_W["bias"] + GD_W["f_acctbal"] * f1 + GD_W["f_nation"] * f2, 9)
        sig = round(1.0 / (1.0 + math.exp(-z)), 10)
        err = sig - y
        sums["bias"] += round(err, 12)
        sums["f_acctbal"] += round(f1 * err, 12)
        sums["f_nation"] += round(f2 * err, 12)
        nll += round(
            -(y * round(math.log(sig), 9) + (1 - y) * round(math.log(1.0 - sig), 9)),
            12,
        )
    n = len(cust)
    for feat, row in got.items():
        grad = round(sums[feat] / n, 8)
        assert abs(row["grad"] - grad) < 1e-7, feat
        assert row["w_old"] == GD_W[feat]
        assert abs(row["w_new"] - round(GD_W[feat] - GD_LR * grad, 8)) < 1e-7
        assert row["n"] == n
        assert abs(row["mean_nll"] - round(nll / n, 8)) < 1e-7
    # a step along -grad must not increase the (convex) objective by much;
    # sanity: gradient isn't all-zero and nll is positive
    assert got["bias"]["mean_nll"] > 0
    assert any(abs(r["grad"]) > 0 for r in got.values())


def test_length_bucket_batching_accounting(spark):
    """Buckets tile the length axis at LBB_STEP granularity; per-bucket
    waste and the global padded-cell identity both close exactly."""
    rows = q_length_bucket_batching(spark, SF_SMALL).collect()
    assert rows
    gmax = max(r["bucket_cap"] for r in rows)
    for r in rows:
        assert r["bucket_cap"] % LBB_STEP == 0
        assert r["bucket_cap"] - LBB_STEP < r["max_tok"] <= r["bucket_cap"]
        assert r["pad_waste"] == r["n_docs"] * r["bucket_cap"] - r["sum_tok"]
        assert 0.0 <= r["waste_pct"] < 1.0
        assert r["cells_saved"] == r["n_docs"] * (gmax - r["bucket_cap"])
    n_docs = sum(r["n_docs"] for r in rows)
    total_cells_bucketed = sum(r["n_docs"] * r["bucket_cap"] for r in rows)
    # pad-to-global-max cells == bucketed cells + total saved
    assert n_docs * gmax == total_cells_bucketed + sum(
        r["cells_saved"] for r in rows
    )
