"""Similarity-search invariants: IVF results are a subset of the exact
brute-force neighborhood (same scoring), and cosine dedup catches exactly the
injected duplicate pairs."""

from __future__ import annotations

import numpy as np

from ccirecommenderdatapipeline_spark import plans
from tests.conftest import SF_SMALL


def _run(spark, name):
    return plans.QUERIES[name](spark, SF_SMALL).toPandas()


def test_brute_force_matches_numpy(spark):
    got = _run(spark, "knn_brute_force")
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").toPandas()
    vecs = np.stack(emb["embedding"].map(np.asarray)).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.linalg.norm(vecs, axis=1)
    for qid in got["query_id"].unique():
        qi = np.where(ids == qid)[0][0]
        cos = (vecs @ vecs[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf
        # numpy dot association differs from the sequential fold -> compare
        # the neighbor SET with a tolerance-based cutoff, not exact ranks
        top = got[got["query_id"] == qid].sort_values("rank")
        expected = set(ids[np.argsort(-cos)[:10]])
        overlap = len(set(top["neighbor_id"]) & expected)
        assert overlap >= 9, (qid, overlap)
        assert np.allclose(
            sorted(cos[np.argsort(-cos)[:10]], reverse=True),
            sorted(top["cosine"], reverse=True),
            atol=1e-9,
        )


def test_ivf_subset_of_brute_force_scores(spark):
    bf = _run(spark, "knn_brute_force")
    ivf = _run(spark, "knn_ivf")
    assert len(ivf) > 0
    # every IVF hit scores exactly what brute force scored for that pair
    merged = ivf.merge(
        bf, on=["query_id", "neighbor_id"], how="left", suffixes=("", "_bf")
    )
    hit = merged["cosine_bf"].notna()
    assert (merged.loc[hit, "cosine"] == merged.loc[hit, "cosine_bf"]).all()
    # recall@5 against exact top-5: 3/16 probes on a 10-cluster fixture —
    # the quality/cost tradeoff ANN makes by design, so the bound is loose
    top5 = bf[bf["rank"] <= 5]
    joined = ivf.merge(top5, on=["query_id", "neighbor_id"], how="inner")
    recall = len(joined) / len(top5)
    assert recall >= 0.4, recall


def test_embedding_dedup_exactly_injected_pairs(spark):
    pairs = _run(spark, "embedding_dedup_cosine")
    assert (pairs["vec_b"] == pairs["vec_a"] + 100000).all()
    n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert len(pairs) == n


def test_embedding_quantize_error_bound(spark):
    """Reconstruction error of uniform int8 quantization is bounded by half
    a quantization step per dimension: err_max <= max_dim_range / 255 / 2
    (+ FP slack)."""
    from pyspark.sql import functions as F
    from ccirecommenderdatapipeline_spark.plans import QUERIES
    from ccirecommenderdatapipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = QUERIES["embedding_quantize"](spark, sf)
    e = load_table(spark, sf, "embeddings")
    dims = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    widest = (
        dims.groupBy("pos").agg((F.max("val") - F.min("val")).alias("rg"))
        .agg(F.max("rg").alias("w")).head()["w"]
    )
    rows = out.collect()
    assert len(rows) == e.count()
    bound = widest / 255 / 2 * (1 + 1e-9)
    for r in rows:
        assert 0.0 <= r["err_max"] <= bound, (r, bound)
        assert 0 <= r["q_sum"] <= 255 * 64


def test_kmeans_lloyd_step_invariants(spark):
    from ccirecommenderdatapipeline_spark import plans
    from ccirecommenderdatapipeline_spark.plans.vectors import K_LLOYD
    from tests.conftest import SF_SMALL

    out = plans.QUERIES["kmeans_lloyd_step"](spark, SF_SMALL).toPandas()
    n_vecs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    # every emitted cid is a seed; every dimension of a cid has the same
    # member count; counts over any single dimension partition the corpus
    assert set(out["cid"]) <= set(range(K_LLOYD))
    per_cid = out.groupby("cid")["n_assigned"].nunique()
    assert (per_cid == 1).all()
    dims = out.groupby("cid")["pos"].count()
    assert dims.nunique() == 1  # same dimensionality everywhere
    one_pos = out[out["pos"] == 0]
    assert one_pos["n_assigned"].sum() == n_vecs
    assert out["coord"].notna().all()


def test_contrastive_triplets_mined_from_index(spark):
    from ccirecommenderdatapipeline_spark import plans
    from tests.conftest import SF_MED

    rows = plans.QUERIES["contrastive_triplets"](spark, SF_MED).collect()
    assert len(rows) >= 1
    iv = {
        (r["query_id"], r["neighbor_id"]): r
        for r in plans.QUERIES["knn_ivf"](spark, SF_MED).collect()
    }
    for r in rows:
        # both sides must come from the index's retrieval set, margin exact
        assert (r["query_id"], r["pos_id"]) in iv
        assert (r["query_id"], r["neg_id"]) in iv
        assert r["margin"] == r["pos_cos"] - r["neg_cos"]
        assert iv[(r["query_id"], r["pos_id"])]["neighbor_label"] == r["query_label"]
        assert iv[(r["query_id"], r["neg_id"])]["neighbor_label"] != r["query_label"]


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np
    from ccirecommenderdatapipeline_spark import plans
    from tests.conftest import SF_SMALL

    out = plans.QUERIES["embedding_covariance"](spark, SF_SMALL).collect()
    vecs = np.array(
        [r["embedding"] for r in
         spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()],
        dtype=float,
    )
    n, d = vecs.shape
    cov = (vecs.T @ vecs) / n - np.outer(vecs.mean(0), vecs.mean(0))
    assert len(out) == d * (d + 1) // 2
    for r in out:
        assert abs(r["cov"] - cov[r["i"], r["j"]]) < 1e-6


def test_power_iteration_rayleigh_positive_unit_v1(spark):
    import math
    from ccirecommenderdatapipeline_spark import plans
    from tests.conftest import SF_SMALL

    rows = plans.QUERIES["pca_power_iteration"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    # v1 is unit-norm; the Rayleigh quotient of a covariance is >= 0 and
    # identical on every row
    nrm = math.sqrt(sum(r["v1_coord"] ** 2 for r in rows))
    assert abs(nrm - 1.0) < 1e-4
    rays = {r["rayleigh"] for r in rows}
    assert len(rays) == 1
    assert rays.pop() >= 0.0
