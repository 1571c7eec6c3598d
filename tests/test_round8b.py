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


def test_isotonic_matches_sequential_pav(spark):
    """Closed-form minimax fit == the classic sequential stack PAV."""
    from ccirecommenderdatapipeline_spark.plans.training import (
        q_isotonic_calibration,
    )

    rows = sorted(
        q_isotonic_calibration(spark, SF_SMALL).collect(), key=lambda r: r["bin"]
    )
    assert rows
    # sequential weighted PAV over the same bins
    blocks = [[r["n_pos"], r["n"]] for r in rows]  # [sum_y, weight]
    stack: list[list[float]] = []
    for pos, n in blocks:
        stack.append([pos, n])
        while len(stack) > 1 and (
            stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
        ):
            p2, n2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
    # expand: each stack block covers a run of bins whose weights sum to
    # the block weight; every bin in the run gets the block mean
    fitted = []
    i = 0
    for pos, n in stack:
        acc = 0
        while acc < n:
            acc += rows[i]["n"]
            fitted.append(pos / n)
            i += 1
        assert acc == n
    assert len(fitted) == len(rows)
    for r, f in zip(rows, fitted):
        assert abs(r["iso_rate"] - f) < 1e-7
    # monotone non-decreasing
    iso = [r["iso_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))


def test_decision_stump_matches_python(spark):
    """Histogram split scores == brute-force recompute; argmin flagged."""
    from ccirecommenderdatapipeline_spark.plans.training import (
        q_decision_stump,
    )

    rows = q_decision_stump(spark, SF_SMALL).collect()
    assert rows
    by_feat: dict[str, list] = {}
    for r in rows:
        by_feat.setdefault(r["feature"], []).append(r)
    assert set(by_feat) == {"acctbal", "nationkey"}
    for feat, rs in by_feat.items():
        nt = rs[0]["n_left"] + rs[0]["n_right"]
        best = None
        for r in rs:
            nl, pl = r["n_left"], r["pos_left"]
            nr_, pr_ = r["n_right"], r["pos_right"]
            assert nl + nr_ == nt and nl > 0 and nr_ > 0
            gl = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
            gr = 1.0 - (pr_ / nr_) ** 2 - ((nr_ - pr_) / nr_) ** 2
            gini = (nl * gl + nr_ * gr) / nt
            assert abs(r["gini_w"] - gini) < 1e-6
            key = (round(gini, 10), r["thr_bin"])
            if best is None or key < best[0]:
                best = (key, r["thr_bin"])
        flagged = [r["thr_bin"] for r in rs if r["is_best"] == 1]
        assert flagged == [best[1]]


def _py_tokens(text: str) -> list:
    import re

    return [t for t in re.sub(r"[^a-z]+", " ", text.lower()).split(" ") if t]


def test_naive_bayes_matches_python(spark):
    """Distributed NB confusion matrix == a from-scratch Python NB with
    the same split, vocab floor, smoothing and nano-nat quantization
    (operators/lnq.py, the r11 schedule: scores are exact integer
    sums of round(ln(p)*1e9) units)."""
    import math
    from collections import Counter

    from ccirecommenderdatapipeline_spark.operators.lnq import LN_UNIT_SCALE
    from ccirecommenderdatapipeline_spark.plans.corpus import (
        NB_MIN_DF,
        q_naive_bayes_classify,
    )

    def lnu(x: float) -> int:
        # round-half-away-from-zero of ln(x)*1e9, matching both engines
        v = math.log(x) * LN_UNIT_SCALE
        return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()
    train = [(r["lang"], _py_tokens(r["text"])) for r in docs if r["doc_id"] % 5]
    test = [(r["lang"], _py_tokens(r["text"])) for r in docs if r["doc_id"] % 5 == 0]
    df: Counter = Counter()
    for _, toks in train:
        df.update(set(toks))
    vocab = {t for t, c in df.items() if c >= NB_MIN_DF}
    model: dict = {}
    ctot: Counter = Counter()
    prior: Counter = Counter()
    for lang, toks in train:
        prior[lang] += 1
        for t in toks:
            if t in vocab:
                model[(lang, t)] = model.get((lang, t), 0) + 1
                ctot[lang] += 1
    nd = sum(prior.values())
    v = len(vocab)
    confusion: Counter = Counter()
    for lang_actual, toks in test:
        cnt = Counter(t for t in toks if t in vocab)
        best = None
        for lang in sorted(prior):
            s = lnu(prior[lang] / nd)
            for t, c in cnt.items():
                s += c * lnu(
                    (model.get((lang, t), 0) + 1) / (ctot[lang] + v)
                )
            if best is None or s > best[0]:
                best = (s, lang)
        confusion[(lang_actual, best[1])] += 1
    got = {
        (r["lang_actual"], r["lang_pred"]): r["n_docs"]
        for r in q_naive_bayes_classify(spark, SF_SMALL).collect()
    }
    assert got == dict(confusion)
    assert sum(got.values()) == len(test)


def test_chi2_matches_python(spark):
    """Grid chi2 == brute-force 2x2 contingency per (token, lang)."""
    from collections import Counter

    from ccirecommenderdatapipeline_spark.plans.corpus import (
        CHI2_CRIT,
        CHI2_MIN_DF,
        q_chi2_feature_selection,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()
    pres = [(r["lang"], set(_py_tokens(r["text"]))) for r in docs]
    n = len(pres)
    df: Counter = Counter()
    for _, toks in pres:
        df.update(toks)
    nl = Counter(lang for lang, _ in pres)
    want = {}
    for tok, dft in df.items():
        if dft < CHI2_MIN_DF:
            continue
        for lang in nl:
            a = sum(1 for lg, toks in pres if lg == lang and tok in toks)
            b, c = dft - a, nl[lang] - a
            d = n - dft - c
            e = a * d - b * c
            chi2 = n * e * e / (dft * (n - dft) * nl[lang] * (n - nl[lang]))
            if chi2 >= CHI2_CRIT:
                want[(tok, lang)] = (a, chi2)
    got = {
        (r["tok"], r["lang"]): r
        for r in q_chi2_feature_selection(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want)
    for k, (a, chi2) in want.items():
        assert got[k]["n_lang_with"] == a
        assert abs(got[k]["chi2"] - chi2) < 1e-5


def test_acf_matches_numpy(spark):
    """Decimal-moment ACF == numpy corrcoef on aligned lag pairs."""
    import numpy as np

    from ccirecommenderdatapipeline_spark.plans.cci import (
        ACF_MAX_LAG,
        ACF_MIN_N,
        q_acf_lags,
    )
    from ccirecommenderdatapipeline_spark.sources.prices import prices_view

    series: dict[str, list] = {}
    for r in prices_view(spark, SF_SMALL).select("symbol", "date", "close_pr").collect():
        series.setdefault(r["symbol"], []).append((r["date"], r["close_pr"]))
    got = {(r["symbol"], r["lag"]): r for r in q_acf_lags(spark, SF_SMALL).collect()}
    want = {}
    for sym, rows in series.items():
        xs = np.array([v for _, v in sorted(rows)])
        for k in range(1, ACF_MAX_LAG + 1):
            if len(xs) - k < ACF_MIN_N:
                continue
            a, b = xs[:-k], xs[k:]
            if a.std() == 0 or b.std() == 0:
                continue
            want[(sym, k)] = (len(a), float(np.corrcoef(a, b)[0, 1]))
    assert set(got) == set(want)
    for key, (n, acf) in want.items():
        assert got[key]["n"] == n
        assert abs(got[key]["acf"] - acf) < 1e-6


def test_bootstrap_matches_python(spark):
    """Distributed Poissonized bootstrap == hashlib recompute."""
    import hashlib

    from ccirecommenderdatapipeline_spark.plans.sampling import (
        BOOT_B,
        BOOT_HI_IDX,
        BOOT_LO_IDX,
        BOOT_MID_IDX,
        BOOT_SEED,
        _BOOT_CDF,
        q_bootstrap_mean_ci,
    )

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    means = []
    for rep in range(1, BOOT_B + 1):
        num = 0.0
        den = 0
        for r in orders:
            h = int(
                hashlib.md5(
                    f"{BOOT_SEED}{r['o_orderkey']}:{rep}".encode()
                ).hexdigest()[:13],
                16,
            )
            u = (h + 1) / 2**52
            w = len(_BOOT_CDF)
            for k, c in enumerate(_BOOT_CDF):
                if u < c:
                    w = k
                    break
            num += w * round(r["o_totalprice"], 2)
            den += w
        means.append(num / den)
    means.sort()
    row = q_bootstrap_mean_ci(spark, SF_SMALL).collect()[0]
    assert row["n_rows"] == len(orders)
    assert row["n_replicates"] == BOOT_B
    assert abs(row["boot_p05"] - means[BOOT_LO_IDX - 1]) < 1e-4
    assert abs(row["boot_p50"] - means[BOOT_MID_IDX - 1]) < 1e-4
    assert abs(row["boot_p95"] - means[BOOT_HI_IDX - 1]) < 1e-4
    assert row["boot_p05"] <= row["boot_p50"] <= row["boot_p95"]


def test_apriori_triples_matches_bruteforce(spark):
    """Candidate-pruned triple counts == brute-force enumeration."""
    from collections import Counter
    from itertools import combinations

    from ccirecommenderdatapipeline_spark.plans.recommender import (
        TRI_SUPPORT,
        q_apriori_triples,
    )

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    brands = {r["p_partkey"]: r["p_brand"] for r in part.collect()}
    baskets: dict[int, set] = {}
    for r in li.collect():
        baskets.setdefault(r["l_orderkey"], set()).add(brands[r["l_partkey"]])
    n = len(baskets)
    cnt: Counter = Counter()
    for bs in baskets.values():
        for tri in combinations(sorted(bs), 3):
            cnt[tri] += 1
    want = {
        tri: c for tri, c in cnt.items() if c >= TRI_SUPPORT * n
    }
    got = {
        (r["brand_a"], r["brand_b"], r["brand_c"]): r["cnt"]
        for r in q_apriori_triples(spark, SF_SMALL).collect()
    }
    assert got == want


def test_spatial_grid_matches_bruteforce(spark):
    """3x3 neighbor-cell blocking finds exactly the brute-force pairs."""
    from ccirecommenderdatapipeline_spark.plans.warehouse import (
        SP_EPS,
        SP_MULT_X,
        SP_MULT_Y,
        SP_SIDE,
        q_spatial_grid_join,
    )

    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    ).collect()
    pts = [
        (
            r["c_custkey"],
            (r["c_custkey"] * SP_MULT_X) % SP_SIDE,
            (r["c_custkey"] * SP_MULT_Y + r["c_nationkey"] * 7919) % SP_SIDE,
        )
        for r in cust
    ]
    want = {}
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= SP_EPS * SP_EPS:
                want[(min(ia, ib), max(ia, ib))] = d2
    got = {
        (r["id_a"], r["id_b"]): r["dist2"]
        for r in q_spatial_grid_join(spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_rrf_matches_python(spark):
    """Fused RRF ordering == recompute from the two systems' rankings."""
    from ccirecommenderdatapipeline_spark.plans.corpus import (
        BM25_TERMS,
        RRF_K,
        RRF_OUT,
        RRF_R,
        q_rank_fusion_rrf,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    # system B reference: raw query-term frequency
    tf = {}
    for r in docs:
        c = sum(1 for t in _py_tokens(r["text"]) if t in BM25_TERMS)
        if c:
            tf[r["doc_id"]] = c
    rank_b = {
        doc: i + 1
        for i, (doc, _) in enumerate(
            sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_R]
        )
    }
    rows = q_rank_fusion_rrf(spark, SF_SMALL).collect()
    assert len(rows) <= RRF_OUT
    # rank_tf agrees with the reference ranking; rrf consistent
    for r in rows:
        if r["rank_tf"] is not None:
            assert rank_b[r["doc_id"]] == r["rank_tf"]
        want = 0.0
        if r["rank_bm25"] is not None:
            want += round(1.0 / (RRF_K + r["rank_bm25"]), 12)
        if r["rank_tf"] is not None:
            want += round(1.0 / (RRF_K + r["rank_tf"]), 12)
        assert abs(r["rrf"] - want) < 1e-7
    # descending fused order with doc_id ties
    keys = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    # both systems contribute somewhere in the fused list
    assert any(r["rank_bm25"] is not None for r in rows)
    assert any(r["rank_tf"] is not None for r in rows)


def test_hll_intersection_properties(spark):
    """Exact intersection == brute force; sketch estimates sane."""
    from ccirecommenderdatapipeline_spark.plans.corpus import (
        HLL_A_HI,
        HLL_A_LO,
        HLL_B_HI,
        HLL_B_LO,
        q_hll_set_intersection,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "source", "text"
    ).collect()

    def trigrams(text):
        toks = _py_tokens(text)
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    a, b = set(), set()
    for r in docs:
        n = int(r["source"][3:])
        t = trigrams(r["text"])
        if HLL_A_LO <= n <= HLL_A_HI:
            a |= t
        if HLL_B_LO <= n <= HLL_B_HI:
            b |= t
    row = q_hll_set_intersection(spark, SF_SMALL).collect()[0]
    assert row["n_exact_inter"] == len(a & b)
    # m=256 gives ~6.5% standard error; allow 4 sigma on each estimate
    assert abs(row["est_a"] - len(a)) / len(a) < 0.3
    assert abs(row["est_b"] - len(b)) / len(b) < 0.3
    assert abs(row["est_union"] - len(a | b)) / len(a | b) < 0.3
    # union register merge dominates both parts
    assert row["est_union"] >= max(row["est_a"], row["est_b"]) - 1e-6


def test_mann_whitney_matches_python(spark):
    """Two-phase rank-sum == direct average-rank computation."""
    import math

    from ccirecommenderdatapipeline_spark.plans.events import (
        MW_TYPE_1,
        MW_TYPE_2,
        q_mann_whitney_u,
    )

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type", "value"
    ).collect()
    sample = [
        (round(r["value"] * 100), r["event_type"] == MW_TYPE_1)
        for r in ev
        if r["event_type"] in (MW_TYPE_1, MW_TYPE_2)
    ]
    sample.sort()
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(sample):
        j = i
        while j < len(sample) and sample[j][0] == sample[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        ranks[sample[i][0]] = avg
        i = j
    r1 = sum(ranks[v] for v, is1 in sample if is1)
    n1 = sum(1 for _, is1 in sample if is1)
    n2 = len(sample) - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    from collections import Counter

    tc = Counter(v for v, _ in sample)
    ties = sum(c**3 - c for c in tc.values())
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    row = q_mann_whitney_u(spark, SF_SMALL).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["u1"] - u1) < 1e-6
    assert abs(row["z"] - z) < 1e-6


def test_em_gmm_matches_numpy(spark):
    """Decimal-summed EM step == numpy EM step (loose tolerance covers
    the rounding schedule)."""
    import numpy as np

    from ccirecommenderdatapipeline_spark.plans.training import (
        GMM_MU,
        GMM_SIG,
        GMM_W,
        q_em_gmm_step,
    )

    x = np.array(
        [
            r["c_acctbal"] / 10000.0
            for r in spark.read.parquet(f"{SF_SMALL}/customer.parquet")
            .select("c_acctbal")
            .collect()
        ]
    )
    p1 = np.exp(-0.5 * ((x - GMM_MU[0]) / GMM_SIG[0]) ** 2) / GMM_SIG[0]
    p2 = np.exp(-0.5 * ((x - GMM_MU[1]) / GMM_SIG[1]) ** 2) / GMM_SIG[1]
    r1 = GMM_W[0] * p1 / (GMM_W[0] * p1 + GMM_W[1] * p2)
    rows = {r["component"]: r for r in q_em_gmm_step(spark, SF_SMALL).collect()}
    for comp, r in ((1, r1), (2, 1 - r1)):
        got = rows[comp]
        assert got["n"] == len(x)
        assert abs(got["w_new"] - r.mean()) < 1e-5
        mu = (r * x).sum() / r.sum()
        assert abs(got["mu_new"] - mu) < 1e-5
        sig = np.sqrt((r * x * x).sum() / r.sum() - mu * mu)
        assert abs(got["sigma_new"] - sig) < 1e-5
    # responsibilities partition: weights sum to 1
    assert abs(rows[1]["w_new"] + rows[2]["w_new"] - 1.0) < 1e-5


def _event_values(spark, types=None):
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type", "value"
    ).collect()
    return [
        (r["event_type"], round(r["value"] * 100))
        for r in rows
        if types is None or r["event_type"] in types
    ]


def test_welch_t_test_matches_python(spark):
    """Exact-cent sufficient statistics == scipy-style Welch formula."""
    import math

    from ccirecommenderdatapipeline_spark.plans.events import (
        WELCH_TYPE_1,
        WELCH_TYPE_2,
        q_welch_t_test,
    )

    sample = _event_values(spark, (WELCH_TYPE_1, WELCH_TYPE_2))
    a = [v / 100.0 for t, v in sample if t == WELCH_TYPE_1]
    b = [v / 100.0 for t, v in sample if t == WELCH_TYPE_2]
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    row = q_welch_t_test(spark, SF_SMALL).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["mean1"] - m1) < 1e-6
    assert abs(row["mean2"] - m2) < 1e-6
    assert abs(row["t"] - t) < 1e-6
    assert abs(row["df"] - df) < 1e-2


def _avg_ranks(values):
    """value -> tie-averaged rank over the sorted multiset."""
    values = sorted(values)
    ranks, i = {}, 0
    while i < len(values):
        j = i
        while j < len(values) and values[j] == values[i]:
            j += 1
        ranks[values[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_kruskal_wallis_matches_python(spark):
    """Divmod-exact H == direct tie-corrected rank ANOVA."""
    from collections import Counter

    from ccirecommenderdatapipeline_spark.plans.events import (
        q_kruskal_wallis,
    )

    sample = _event_values(spark)
    ranks = _avg_ranks([v for _, v in sample])
    groups: dict[str, list] = {}
    for g, v in sample:
        groups.setdefault(g, []).append(v)
    n = len(sample)
    h = 12.0 / (n * (n + 1)) * sum(
        sum(ranks[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3.0 * (n + 1)
    tc = Counter(v for _, v in sample)
    corr = 1.0 - sum(c**3 - c for c in tc.values()) / (n**3 - n)
    h /= corr
    rows = q_kruskal_wallis(spark, SF_SMALL).collect()
    assert {r["event_type"] for r in rows} == set(groups)
    for r in rows:
        vs = groups[r["event_type"]]
        assert r["n_g"] == len(vs)
        r2x = round(2 * sum(ranks[v] for v in vs))
        assert r["rank_sum_x2"] == r2x
        assert abs(r["h"] - h) < 1e-5


def test_roc_auc_matches_python(spark):
    """Rank-statistic AUC == direct pairwise win/tie count."""
    from ccirecommenderdatapipeline_spark.plans.quality import (
        AUC_POS_LANG,
        q_roc_auc_eval,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "lang", "n_chars"
    ).collect()
    pos = [r["n_chars"] for r in docs if r["lang"] == AUC_POS_LANG]
    neg = [r["n_chars"] for r in docs if r["lang"] != AUC_POS_LANG]
    wins = sum(1.0 for p in pos for q in neg if p > q) + sum(
        0.5 for p in pos for q in neg if p == q
    )
    auc = wins / (len(pos) * len(neg))
    row = q_roc_auc_eval(spark, SF_SMALL).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    assert abs(row["auc"] - auc) < 1e-8
    assert abs(row["gini"] - (2 * auc - 1)) < 1e-8


def _doc_tokens(spark):
    import re

    rows = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    out = {}
    for r in rows:
        toks = [t for t in re.sub(r"[^a-z]+", " ", r["text"].lower()).split() if t]
        out[r["doc_id"]] = (toks, r["lang"], r["source"])
    return out


def test_jaccard_prefix_filter_matches_bruteforce(spark):
    """Prefix-filter join == brute-force all-pairs Jaccard (losslessness)."""
    from ccirecommenderdatapipeline_spark.plans.text import (
        PFJ_N,
        PFJ_T,
        q_jaccard_prefix_filter_join,
    )

    docs = _doc_tokens(spark)
    sets = {
        d: {
            " ".join(toks[i : i + PFJ_N])
            for i in range(len(toks) - PFJ_N + 1)
        }
        for d, (toks, _, _) in docs.items()
        if len(toks) >= PFJ_N
    }
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a]) + len(sets[b]) - inter
            if inter / union >= PFJ_T:
                want[(a, b)] = (inter, union)
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter_grams"], r["union_grams"])
        for r in q_jaccard_prefix_filter_join(spark, SF_SMALL).collect()
    }
    assert got == want
    assert want, "fixture must produce at least one qualifying pair"


def test_phrase_search_matches_python(spark):
    """Positional-index phrase join == direct adjacent-token scan."""
    from ccirecommenderdatapipeline_spark.plans.corpus import (
        PHRASE_T1,
        PHRASE_T2,
        q_phrase_search_positions,
    )

    docs = _doc_tokens(spark)
    want = {}
    for d, (toks, _, _) in docs.items():
        hits = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE_T1 and toks[i + 1] == PHRASE_T2
        ]
        if hits:
            want[d] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in q_phrase_search_positions(spark, SF_SMALL).collect()
    }
    assert got == want
    assert want, "fixture must contain the phrase"


def test_oov_rate_matches_python(spark):
    """Frozen top-V vocab + per-lang OOV == direct Counter computation."""
    from collections import Counter

    from ccirecommenderdatapipeline_spark.plans.corpus import (
        OOV_TRAIN_MAX,
        OOV_V,
        q_oov_rate_eval,
    )

    docs = _doc_tokens(spark)
    train = Counter()
    for toks, _, src in docs.values():
        if int(src[3:]) < OOV_TRAIN_MAX:
            train.update(toks)
    vocab = {
        w
        for w, _ in sorted(train.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_V
        ]
    }
    want = {}
    for toks, lang, src in docs.values():
        if int(src[3:]) >= OOV_TRAIN_MAX:
            n, o = want.get(lang, (0, 0))
            want[lang] = (
                n + len(toks),
                o + sum(1 for t in toks if t not in vocab),
            )
    got = {
        r["lang"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in q_oov_rate_eval(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want)
    for lang, (n, o) in want.items():
        gn, go, gr = got[lang]
        assert (gn, go) == (n, o)
        assert abs(gr - o / n) < 1e-12


def test_hits_matches_python(spark):
    """Unrolled integer HITS == direct numpy-free power iteration."""
    from ccirecommenderdatapipeline_spark.plans.graph import (
        HITS_ROUNDS,
        q_hits_hubs_authorities,
    )

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    }
    brands = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_SMALL}/part.parquet").collect()
    }
    edges = {(orders[r["l_orderkey"]], brands[r["l_partkey"]]) for r in li}
    by_c: dict = {}
    by_b: dict = {}
    for c, b in edges:
        by_c.setdefault(c, []).append(b)
        by_b.setdefault(b, []).append(c)
    h = {c: 1 for c in by_c}
    a = {}
    for rnd in range(HITS_ROUNDS):
        a = {b: sum(h[c] for c in cs) for b, cs in by_b.items()}
        h = {c: sum(a[b] for b in bs) for c, bs in by_c.items()}
    tot = sum(a.values())
    got = {r["brand"]: r for r in q_hits_hubs_authorities(spark, SF_SMALL).collect()}
    assert set(got) == set(by_b)
    for b, row in got.items():
        assert row["degree"] == len(by_b[b])
        assert int(row["authority_raw"]) == a[b]
        assert abs(row["authority"] - a[b] / tot) < 1e-10


def test_theil_sen_matches_python(spark):
    """Pair-join median slope == direct O(n^2) python computation."""
    from ccirecommenderdatapipeline_spark.plans.cci import (
        TS_SLOPE_DP,
        TS_WINDOW,
        q_theil_sen_slope,
    )
    from ccirecommenderdatapipeline_spark.sources.prices import prices_view

    rows = prices_view(spark, SF_SMALL).select("symbol", "date", "close_pr").collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["symbol"], []).append((r["date"], float(r["close_pr"])))
    got = {r["symbol"]: r for r in q_theil_sen_slope(spark, SF_SMALL).collect()}
    for sym, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts][-TS_WINDOW:]
        slopes = sorted(
            round((ys[j] - ys[i]) / (j - i), TS_SLOPE_DP)
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        r = got[sym]
        assert r["n_days"] == len(ys)
        assert r["n_pairs"] == len(slopes)
        assert abs(r["ts_slope"] - slopes[(len(slopes) + 1) // 2 - 1]) < 1e-9


def test_cooccurrence_matches_python(spark):
    """Shifted-slice pair arrays == direct window scan with 1/d weights."""
    from collections import Counter
    from decimal import Decimal

    from ccirecommenderdatapipeline_spark.plans.corpus import (
        COOC_W,
        COOC_WEIGHTS,
        q_cooccurrence_window_weighted,
    )

    docs = _doc_tokens(spark)
    cnt: Counter = Counter()
    wsum: dict = {}
    for toks, _, _ in docs.values():
        for i in range(len(toks)):
            for d in range(1, COOC_W + 1):
                if i + d >= len(toks):
                    break
                key = tuple(sorted((toks[i], toks[i + d])))
                cnt[key] += 1
                wsum[key] = wsum.get(key, Decimal(0)) + Decimal(
                    COOC_WEIGHTS[d]
                )
    got = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["w_sum"])
        for r in q_cooccurrence_window_weighted(spark, SF_SMALL).collect()
    }
    assert set(got) == set(cnt)
    for key in cnt:
        assert got[key][0] == cnt[key]
        # readout contract since r10: the exact decimal sum is flattened
        # to its nearest double (engine-portable); compare at that type
        assert got[key][1] == float(wsum[key])


def test_bloom_semi_join_matches_python(spark):
    """Bloom pruning keeps exactly the positions-hit orders; the exact
    join result equals an unpruned join (false positives harmless)."""
    import hashlib

    from ccirecommenderdatapipeline_spark.plans.warehouse import (
        BSJ_K,
        BSJ_NATION_MAX,
        BSJ_SEGMENT,
        q_bloom_semi_join_pushdown,
    )

    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    dim = {
        r["c_custkey"]
        for r in cust
        if r["c_mktsegment"] == BSJ_SEGMENT
        and r["c_nationkey"] < BSJ_NATION_MAX
    }

    def pos(v, s):
        return int(
            hashlib.md5(f"j{s}:{v}".encode()).hexdigest()[:4], 16
        )

    bits = [{pos(k, s) for k in dim} for s in range(BSJ_K)]
    pruned = [
        r
        for r in orders
        if all(pos(r["o_custkey"], s) in bits[s] for s in range(BSJ_K))
    ]
    joined = [r for r in pruned if r["o_custkey"] in dim]
    plain = [r for r in orders if r["o_custkey"] in dim]
    assert {r["o_orderkey"] for r in joined} == {
        r["o_orderkey"] for r in plain
    }  # bloom pruning is lossless for the exact join
    row = q_bloom_semi_join_pushdown(spark, SF_SMALL).collect()[0]
    assert row["n_fact"] == len(orders)
    assert row["n_after_bloom"] == len(pruned)
    assert row["n_joined"] == len(joined)
    from decimal import Decimal

    want_rev = sum(
        Decimal(str(round(r["o_totalprice"], 2))) for r in joined
    )
    assert row["revenue"] == want_rev


def test_char_entropy_matches_python(spark):
    """HOF decimal entropy == direct Counter entropy (loose tol covers
    the rounding schedule)."""
    import math
    import re
    from collections import Counter

    from ccirecommenderdatapipeline_spark.plans.quality import (
        q_char_entropy_quality,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    per_lang: dict = {}
    for r in docs:
        cs = re.sub(r"[^a-z]+", "", r["text"].lower())
        if not cs:
            continue
        cnt = Counter(cs)
        n = len(cs)
        h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        per_lang.setdefault(r["lang"], []).append(h)
    got = {r["lang"]: r for r in q_char_entropy_quality(spark, SF_SMALL).collect()}
    assert set(got) == set(per_lang)
    for lang, hs in per_lang.items():
        r = got[lang]
        assert r["n_docs"] == len(hs)
        assert abs(r["mean_char_entropy"] - sum(hs) / len(hs)) < 1e-6
        assert abs(float(r["max_char_entropy"]) - max(hs)) < 1e-6
        assert 0.0 < r["mean_char_entropy"] < math.log(26)


def test_markov_attribution_matches_python(spark):
    """One-row expression-chain fixed point == direct python chain solve."""
    from ccirecommenderdatapipeline_spark.plans.events import (
        MK_CHANNELS,
        MK_ITERS,
        q_markov_attribution,
    )

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    from collections import Counter

    trans: Counter = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        fp = next(
            (i for i, r in enumerate(rows) if r["event_type"] == "purchase"),
            None,
        )
        converted = fp is not None
        pre = rows if fp is None else rows[:fp]
        touches = [r["event_type"] for r in pre if r["event_type"] in MK_CHANNELS]
        if not touches:
            trans[("START", "CONV" if converted else "NULL")] += 1
            continue
        trans[("START", touches[0])] += 1
        for a, b in zip(touches, touches[1:]):
            trans[(a, b)] += 1
        trans[(touches[-1], "CONV" if converted else "NULL")] += 1

    def conv_p(removed=None):
        p = {ch: 0.0 for ch in MK_CHANNELS}
        m = {}
        for s in MK_CHANNELS:
            tot = sum(n for (a, _), n in trans.items() if a == s)
            for t in list(MK_CHANNELS) + ["CONV"]:
                m[(s, t)] = trans.get((s, t), 0) / tot if tot else 0.0
        stot = sum(n for (a, _), n in trans.items() if a == "START")
        for _ in range(MK_ITERS):
            p = {
                ch: sum(
                    m[(ch, t)] * p[t]
                    for t in MK_CHANNELS
                    if t != removed
                )
                + m[(ch, "CONV")]
                for ch in MK_CHANNELS
            }
        return (
            sum(
                trans.get(("START", s), 0) / stot * p[s]
                for s in MK_CHANNELS
                if s != removed
            )
            + trans.get(("START", "CONV"), 0) / stot
        )

    base = conv_p()
    rem = {r: conv_p(removed=r) for r in MK_CHANNELS}
    re_sum = sum(base - v for v in rem.values())
    got = {r["channel"]: r for r in q_markov_attribution(spark, SF_SMALL).collect()}
    assert set(got) == set(MK_CHANNELS)
    for ch in MK_CHANNELS:
        r = got[ch]
        assert abs(r["base_conv_p"] - base) < 1e-9
        assert abs(r["removal_conv_p"] - rem[ch]) < 1e-9
        assert abs(r["removal_effect"] - (base - rem[ch]) / base) < 1e-8
        assert abs(r["attribution_share"] - (base - rem[ch]) / re_sum) < 1e-8
    # removing any channel cannot raise conversion probability
    assert all(rem[ch] <= base + 1e-12 for ch in MK_CHANNELS)


def test_join_cardinality_estimate_matches_python(spark):
    """Histogram containment estimate == direct python computation, and
    the actual count is the true join size."""
    from ccirecommenderdatapipeline_spark.plans.warehouse import (
        JCE_BUCKETS,
        q_join_cardinality_estimate,
    )

    cust = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    ]
    ords = [
        r["o_custkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    ]
    lo, hi = min(cust), max(cust)

    def b(k):
        return min(int((k - lo) / (hi - lo + 1) * JCE_BUCKETS), JCE_BUCKETS - 1)

    from collections import Counter, defaultdict

    na, nb = Counter(), Counter()
    da, db = defaultdict(set), defaultdict(set)
    for k in ords:
        na[b(k)] += 1
        da[b(k)].add(k)
    for k in cust:
        nb[b(k)] += 1
        db[b(k)].add(k)
    est = sum(
        round(na[x] * nb[x] / max(len(da[x]), len(db[x])), 6)
        for x in na
        if x in nb
    )
    cs = set(cust)
    actual = sum(1 for k in ords if k in cs)
    row = q_join_cardinality_estimate(spark, SF_SMALL).collect()[0]
    assert row["actual_cardinality"] == actual
    assert abs(row["est_cardinality"] - est) < 1e-5
    assert abs(row["q_error"] - max(est / actual, actual / est)) < 1e-5
    assert row["q_error"] >= 1.0


def test_gbdt_boost_round_matches_python(spark):
    """Histogram boosting == direct row-level two-round boosting."""
    from ccirecommenderdatapipeline_spark.plans.training import (
        GBDT_BINS,
        GBDT_LR,
        q_gbdt_boost_round,
    )

    rows = spark.read.parquet(f"{SF_SMALL}/customer.parquet").select(
        "c_acctbal", "c_mktsegment"
    ).collect()
    xs = [r["c_acctbal"] for r in rows]
    ys = [1.0 if r["c_mktsegment"] == "BUILDING" else 0.0 for r in rows]
    lo, hi = min(xs), max(xs)
    bins = [
        min(int((x - lo) / (hi - lo) * GBDT_BINS), GBDT_BINS - 1) for x in xs
    ]
    n = len(ys)
    f0 = sum(ys) / n

    def fit_stump(resid):
        best = None
        for thr in range(max(bins)):
            left = [r for b, r in zip(bins, resid) if b <= thr]
            right = [r for b, r in zip(bins, resid) if b > thr]
            if not left or not right:
                continue
            score = sum(left) ** 2 / len(left) + sum(right) ** 2 / len(right)
            if best is None or score > best[0] + 1e-9:
                best = (
                    score,
                    thr,
                    sum(left) / len(left),
                    sum(right) / len(right),
                )
        return best[1], best[2], best[3]

    r1 = [y - f0 for y in ys]
    thr1, g1l, g1r = fit_stump(r1)
    pred1 = [
        f0 + GBDT_LR * (g1l if b <= thr1 else g1r) for b in bins
    ]
    r2 = [y - p for y, p in zip(ys, pred1)]
    thr2, g2l, g2r = fit_stump(r2)
    pred2 = [
        p + GBDT_LR * (g2l if b <= thr2 else g2r)
        for p, b in zip(pred1, bins)
    ]
    mse1 = sum((y - p) ** 2 for y, p in zip(ys, pred1)) / n
    mse2 = sum((y - p) ** 2 for y, p in zip(ys, pred2)) / n
    got = {r["round"]: r for r in q_gbdt_boost_round(spark, SF_SMALL).collect()}
    assert got[1]["thr_bin"] == thr1
    assert abs(got[1]["gamma_left"] - g1l) < 1e-6
    assert abs(got[1]["gamma_right"] - g1r) < 1e-6
    assert abs(got[1]["train_mse"] - mse1) < 1e-6
    assert got[2]["thr_bin"] == thr2
    assert abs(got[2]["gamma_left"] - g2l) < 1e-6
    assert abs(got[2]["gamma_right"] - g2r) < 1e-6
    assert abs(got[2]["train_mse"] - mse2) < 1e-6
    assert got[2]["train_mse"] <= got[1]["train_mse"] + 1e-12  # boosting helps


def test_ks_test_matches_python(spark):
    """Integer-argmax KS == direct CDF sweep."""
    import math

    from ccirecommenderdatapipeline_spark.plans.events import (
        KS_TYPE_1,
        KS_TYPE_2,
        q_ks_test,
    )

    sample = _event_values(spark, (KS_TYPE_1, KS_TYPE_2))
    a = sorted(v for t, v in sample if t == KS_TYPE_1)
    b = sorted(v for t, v in sample if t == KS_TYPE_2)
    n1, n2 = len(a), len(b)
    values = sorted(set(a) | set(b))
    import bisect

    best = (0, None)
    for v in values:
        c1 = bisect.bisect_right(a, v)
        c2 = bisect.bisect_right(b, v)
        num = abs(c1 * n2 - c2 * n1)
        if num > best[0]:
            best = (num, v)
    d = best[0] / (n1 * n2)
    lam = d * math.sqrt(n1 * n2 / (n1 + n2))
    row = q_ks_test(spark, SF_SMALL).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_at_cents"] == best[1]
    assert abs(row["d_stat"] - d) < 1e-10
    assert abs(row["ks_lambda"] - lam) < 1e-8


def test_rank_biased_overlap_matches_python(spark):
    """RBO over the two rankers == direct prefix-overlap computation."""
    from ccirecommenderdatapipeline_spark.plans.corpus import (
        RBO_D,
        RBO_P,
        q_rank_biased_overlap,
    )

    docs = _doc_tokens(spark)
    meta = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    ra = sorted(docs, key=lambda d: (-meta[d], d))[:RBO_D]
    rb = sorted(docs, key=lambda d: (-len(set(docs[d][0])), d))[:RBO_D]
    rbo = 0.0
    for d in range(1, RBO_D + 1):
        x = len(set(ra[:d]) & set(rb[:d]))
        rbo += round(RBO_P ** (d - 1) * x / d, 12)
    rbo *= 1 - RBO_P
    row = q_rank_biased_overlap(spark, SF_SMALL).collect()[0]
    assert row["depth"] == RBO_D
    assert row["overlap_at_depth"] == len(set(ra) & set(rb))
    assert abs(row["rbo"] - rbo) < 1e-8
    assert 0.0 <= row["rbo"] <= 1.0


def _price_series(spark):
    from ccirecommenderdatapipeline_spark.sources.prices import prices_view

    rows = prices_view(spark, SF_SMALL).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["symbol"], []).append(r)
    for pts in series.values():
        pts.sort(key=lambda r: r["date"])
    return series


def test_ohlc_resample_matches_python(spark):
    """min_by/max_by weekly bars == direct first/last-of-week picks."""
    import datetime

    from ccirecommenderdatapipeline_spark.plans.cci import (
        q_ohlc_resample_weekly,
    )

    series = _price_series(spark)
    want = {}
    for sym, pts in series.items():
        weeks: dict = {}
        for r in pts:
            ws = r["date"] - datetime.timedelta(days=r["date"].weekday())
            weeks.setdefault(ws, []).append(r)
        for ws, rs in weeks.items():
            want[(sym, ws)] = (
                rs[0]["open_pr"],
                max(x["high_pr"] for x in rs),
                min(x["low_pr"] for x in rs),
                rs[-1]["close_pr"],
                sum(x["daily_trade_stock"] for x in rs),
                len(rs),
            )
    got = {
        (r["symbol"], r["week_start"]): (
            r["w_open"], r["w_high"], r["w_low"], r["w_close"],
            r["w_volume"], r["n_days"],
        )
        for r in q_ohlc_resample_weekly(spark, SF_SMALL).collect()
    }
    assert got == want


def test_sharpe_sortino_matches_python(spark):
    """Decimal-summed moments == direct float computation."""
    import math

    from ccirecommenderdatapipeline_spark.plans.cci import (
        SR_ANN,
        SR_R_DP,
        q_sharpe_sortino_daily,
    )

    series = _price_series(spark)
    got = {r["symbol"]: r for r in q_sharpe_sortino_daily(spark, SF_SMALL).collect()}
    for sym, pts in series.items():
        cl = [r["close_pr"] for r in pts]
        rs = [
            round(b / a - 1.0, SR_R_DP) for a, b in zip(cl, cl[1:])
        ]
        neg = [r for r in rs if r < 0]
        if len(rs) < 2 or not neg:
            assert sym not in got
            continue
        n = len(rs)
        mean = sum(rs) / n
        var = (sum(r * r for r in rs) - sum(rs) ** 2 / n) / (n - 1)
        dstd = math.sqrt(sum(r * r for r in neg) / n)
        row = got[sym]
        assert row["n"] == n
        assert abs(row["mean_r"] - mean) < 1e-7
        assert abs(row["std_r"] - math.sqrt(var)) < 1e-7
        assert abs(row["sharpe_ann"] - mean / math.sqrt(var) * math.sqrt(SR_ANN)) < 1e-4
        assert abs(row["sortino_ann"] - mean / dstd * math.sqrt(SR_ANN)) < 1e-4
