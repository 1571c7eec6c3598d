"""Late-round-8 operator invariants, each against an independent
pure-Python reference (the oracle gate already pins Spark==DuckDB; these
pin the SEMANTICS against a third implementation)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _brand_graph(spark):
    from ccirecommenderdatapipeline_spark.plans.graph import _brand_edges

    edges = {(r["u"], r["v"]) for r in _brand_edges(spark, SF_SMALL).collect()}
    adj: dict[str, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return edges, adj


def test_clustering_coefficient_matches_python(spark):
    """Oriented-wedge per-node triangles == brute-force neighborhood scan."""
    from ccirecommenderdatapipeline_spark.plans.graph import (
        q_clustering_coefficient,
    )

    edges, adj = _brand_graph(spark)
    got = {r["brand"]: r for r in q_clustering_coefficient(spark, SF_SMALL).collect()}
    assert set(got) == set(adj)
    for node, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and (min(a, b), max(a, b)) in edges
        )
        r = got[node]
        assert r["degree"] == d
        assert r["n_triangles"] == tri
        if d >= 2:
            assert abs(r["lcc"] - 2.0 * tri / (d * (d - 1))) < 1e-7
        else:
            assert r["lcc"] is None


def test_link_prediction_jaccard_matches_python(spark):
    """Wedge-join common neighbors == brute-force set intersection, and
    no predicted pair is already an edge."""
    from ccirecommenderdatapipeline_spark.plans.graph import (
        q_link_prediction_jaccard,
    )

    edges, adj = _brand_graph(spark)
    rows = q_link_prediction_jaccard(spark, SF_SMALL).collect()
    got = {(r["brand_a"], r["brand_b"]): r for r in rows}
    assert len(got) == len(rows)  # canonical pairs are unique
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            common = len(adj[a] & adj[b])
            if common:
                want[(a, b)] = (common, common / len(adj[a] | adj[b]))
    assert set(got) == set(want)
    for k, (common, jac) in want.items():
        assert got[k]["common_neighbors"] == common
        assert abs(got[k]["jaccard"] - jac) < 1e-7
