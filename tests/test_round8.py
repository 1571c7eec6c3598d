"""Round-8 operator invariants, each against an independent pure-Python
reference (the oracle gate already pins Spark==DuckDB; these pin the
SEMANTICS against a third implementation)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stream_ivm_equals_batch_view(spark):
    """The streaming-maintained IVM view must equal the batch merge op
    row-for-row (same algebra, different batching)."""
    from ccirecommenderdatapipeline_spark.plans.storage import (
        q_ivm_aggregate_merge,
    )
    from ccirecommenderdatapipeline_spark.streaming.jobs import (
        stream_ivm_aggregate,
    )

    batch = {
        (r["month"], r["priority"]): (r["n_orders"], r["revenue"])
        for r in q_ivm_aggregate_merge(spark, SF_SMALL).collect()
    }
    stream = {
        (r["month"], r["priority"]): (r["n_orders"], r["revenue"])
        for r in stream_ivm_aggregate(spark, SF_SMALL).collect()
    }
    assert batch == stream and len(batch) > 0


def test_weighted_median_matches_python(spark):
    """Two-phase weighted quantiles == brute-force weighted quantiles."""
    from ccirecommenderdatapipeline_spark.plans.analytics import (
        WM_QS,
        q_weighted_median,
    )

    got = {r["l_returnflag"]: r for r in q_weighted_median(spark, SF_SMALL).collect()}
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lid"),
    ).collect()
    by_flag: dict[str, list] = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["lid"], int(r["l_quantity"]))
        )
    for flag, rows in by_flag.items():
        rows.sort()
        total = sum(w for _, _, w in rows)
        assert got[flag]["total_weight"] == total
        for p, q in WM_QS:
            target = math.ceil(q * total)
            cum = 0
            want = None
            for v, _, w in rows:
                cum += w
                if cum >= target:
                    want = v
                    break
            assert got[flag][f"wq{p}"] == want, (flag, p)


def test_quantile_sketch_bound_is_tight_enough(spark):
    """Every driver-checked boolean must be TRUE at fixture scale, and
    the summary must actually be sub-linear when k > 1."""
    from ccirecommenderdatapipeline_spark.plans.analytics import (
        q_quantile_sketch_merge,
    )

    rows = q_quantile_sketch_merge(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["sketch_q10_ok"] and r["sketch_q50_ok"] and r["sketch_q90_ok"]
        assert r["summary_sublinear"]


def test_vocab_build_ids_and_coverage(spark):
    """Contiguous ids, frequency-sorted, monotone coverage ending at the
    vocabulary's true token share."""
    from ccirecommenderdatapipeline_spark.plans.corpus import q_vocab_build

    rows = sorted(
        q_vocab_build(spark, SF_SMALL).collect(), key=lambda r: r["token_id"]
    )
    assert [r["token_id"] for r in rows] == list(range(1, len(rows) + 1))
    tfs = [r["tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    cov = [r["cum_coverage"] for r in rows]
    assert all(a <= b for a, b in zip(cov, cov[1:]))
    assert 0 < cov[-1] <= 1.0


def test_bandit_replay_matches_python(spark):
    """Cross-multiplied argmax == Fraction-exact posterior argmax."""
    from fractions import Fraction

    from ccirecommenderdatapipeline_spark.plans.recommender import (
        BANDIT_A0,
        BANDIT_B0,
        q_bandit_replay_eval,
    )

    got = {r["day"]: r["chosen_arm"] for r in q_bandit_replay_eval(spark, SF_SMALL).collect()}
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.col("ts").cast("date").alias("day"), "event_type",
        (F.round("value", 6) * 1_000_000).cast("long").alias("u"),
    ).collect()
    daily: dict = {}
    arms, days = set(), set()
    for r in ev:
        k = (r["event_type"], r["day"])
        n, u = daily.get(k, (0, 0))
        daily[k] = (n + 1, u + r["u"])
        arms.add(r["event_type"])
        days.add(r["day"])
    for day in sorted(days):
        best = None
        for arm in sorted(arms):
            a, b = BANDIT_A0, BANDIT_B0
            for d2 in sorted(days):
                if d2 >= day:
                    break
                n, u = daily.get((arm, d2), (0, 0))
                a, b = a + u, b + n
            mean = Fraction(a, b)
            if best is None or mean > best[0]:
                best = (mean, arm)
        assert got[day] == best[1], day


def test_sssp_matches_dijkstra(spark):
    """Relaxation fixed point == heap Dijkstra on the collected graph."""
    import heapq

    from ccirecommenderdatapipeline_spark.plans.graph import q_sssp_weighted

    got = {r["brand"]: r["dist"] for r in q_sssp_weighted(spark, SF_SMALL).collect()}
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    ob = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    baskets: dict = {}
    for r in ob:
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    from collections import Counter
    from itertools import combinations

    pairs = Counter()
    for s in baskets.values():
        pairs.update(combinations(sorted(s), 2))
    adj: dict = {}
    for (u, v), c in pairs.items():
        w = max(1, 1_000_000 // c)
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    src = min(adj)
    dist = {src: 0}
    heap = [(0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    assert got == dist
