"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric","value","unit","queries","sf"}.

The FINAL stdout line is kept compact (total + the 10 slowest queries)
because the round driver captures only the tail of the output — with 131
headline queries the full per-query dict grew past that capture and
BENCH_r08.json recorded ``parsed: null`` (VERDICT r8 item 3). The full
per-query dict is always written to BENCH_LOCAL.json (committed once per
round) and printed as a non-final line for humans reading the log.

``--full`` times EVERY registered query (the bench-tail audit, VERDICT r8
item 5) instead of the headline list, writing BENCH_FULL.json; run it at
sf0.01 once per round so a pathological plan in the unbenched tail cannot
hide behind the headline sample.

A fixed warm-up set (one batch query for JVM/JIT, one applyInPandas for
the Python-worker pool, one availableNow stream for the micro-batch
engine) absorbs session start-up; each query is then timed on a single
steady-state run (what a long-lived cluster sees). ``--full`` sweeps in
ALPHABETICAL order so per-query cells keep a stable sweep position
across rounds despite the rotating driver window (VERDICT r12 item 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ccirecommenderdatapipeline_spark import plans  # noqa: E402
from ccirecommenderdatapipeline_spark.session import get_spark  # noqa: E402

# 1-minute loadavg at sweep start; module-level default so references
# outside main() (imports, run_once-only callers) never hit NameError
# (ADVICE r13 item 1).
_LOAD_START: float | None = None

# Committed-artifact load gate (VERDICT r13 item 3): a sweep started on a
# busy box measures the BOX, not the plans — r12 committed 301.7 s over a
# same-code 255.0 s run because "latest run wins" had no idle-ness
# condition. A run with loadavg_start above this threshold is marked
# contaminated and may NOT overwrite a clean committed artifact; it still
# prints its full payload to stdout for the log.
LOAD_GATE = 1.0

# Headline queries: the flagship pipeline stages + the north-star
# training-data operators at the same scale factor.
HEADLINE = [
    "prices",
    "cci",
    "buy_signals",
    "signal_counts",
    "latest_cci",
    "trades_sim",
    "strategy_agg",
    "best_return",
    "best_return_full_grid",  # the reference's full 4,860-combo workload
    "pareto_strategies",         # 2-D skyline over the strategy grid (r7;
                                 # scheduled here so the plan-matched
                                 # agged_view cache is warm — a pipeline
                                 # runs the selection family together)
    # --- text/dedup family, scheduled ADJACENT so each query runs with
    # its plan-matched cache producers warm (VERDICT r7 item 6: the same
    # grouping that took pareto_strategies 23.5s -> 1.96s; a real pipeline
    # runs the dedup sweep as one stage, so warm shared token/shingle
    # subtrees are the representative condition, not an artifact) ---
    "text_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "winnowing_dedup",           # MOSS per-window-min fingerprint dedup (r4)
    "dedup_containment",         # asymmetric-containment near-dup (r5)
    "dedup_simhash_hamming",     # banded-pigeonhole SimHash near-dup (r7)
    "semantic_dedup",            # SemDeDup centroid-blocked pairs (r4)
    "boilerplate_ngram_scrub",   # corpus-frequency chunk scrub (r7)
    "knn_brute_force",
    "knn_ivf",                   # the ANN scale path next to its baseline
    "session_windows",
    "quality_filtered_corpus",   # quality gates + dedup composition (r2)
    "interval_join_attribution", # event-time interval join (r2)
    "gap_fill_daily",            # calendar densification + forward fill (r2)
    "tpch_q1",                   # scan-heavy pricing summary (r3)
    "tpch_q5",                   # six-table snowflake join chain (r3)
    "funnel_analysis",           # sequential-stage event funnel (r3)
    "bm25_search",               # inverted-index lexical ranking (r3)
    "tpch_q21",                  # EXISTS/NOT-EXISTS semi+anti cascade (r4)
    "cluster_margin",            # broadcast-centroid embedding scoring (r4)
    "cdc_apply",                 # CDC merge: upserts + tombstones (r4)
    "entity_resolution_qgram",   # prefix-filtered ER scale path (r4)
    "training_order_shuffle",    # two-phase seeded global order (r4)
    "bigram_perplexity",         # corpus LM scoring chain (r4)
    "cogroup_asof",              # COGROUP searchsorted as-of join (r5)
    "training_pipeline",         # end-to-end train-file prep chain (r5)
    "ann_recall_eval",           # sampled IVF recall eval harness (r5)
    "embedding_covariance",      # (dim,dim) cross-moment shuffle (r7)
    "interval_merge",            # overlapping-interval island merge (r7)
    "pca_power_iteration",       # D-sized iterative matvec jobs (r7)
    "feature_binning",           # two-phase bucketed exact NTILE (r7)
    "token_budget_selection",    # two-phase running-sum budget draw (r7)
    "weighted_sample_wr",        # A-ES weighted draw w/o replacement (r7)
    "cms_term_freq",             # Count-Min sketch frequencies (r7)
    "corpus_drift_kl",           # per-source KL drift telemetry (r7)
    "embedding_truncation_recall",  # matryoshka retrieval eval (r7)
    "cube_grouping_battery",     # CUBE + grouping_id battery (r7)
    "market_basket_pairs",       # A-priori pair pass w/ lift (r7b)
    "item_item_cosine",          # item-item CF neighbor lists (r7b)
    "brand_transition_matrix",   # Markov purchase sequences (r7b)
    "decayed_popularity",        # dyadic-exact recency prior (r7b)
    "reco_candidates",           # recall-stage candidate gen (r7b)
    "ndcg_eval",                 # temporal-split ranking eval (r7b)
    "triangle_count_oriented",   # degree-oriented triangles (r7b)
    "logreg_gd_step",            # full-batch GD allreduce shape (r7b)
    "target_encoding_loo",       # leakage-free LOO encoding (r7b)
    "rendezvous_sharding",       # HRW placement telemetry (r7b)
    "ab_test_zscore",            # two-proportion experiment readout (r7b)
    "reco_coverage_gini",        # exposure coverage + Gini audit (r7b)
    "logreg_calibration_bins",   # reliability diagram + ECE (r7b)
    "conformal_calibration",     # split-conformal coverage (r7b)
    "info_gain_features",        # ID3 info-gain feature ranking (r7b)
    "fairness_metrics",          # subgroup parity/odds audit (r7b)
    "propensity_ipw",            # IPW treatment effect + ESS (r7b)
    "dp_noisy_counts",           # Laplace-mechanism release rig (r7b)
    "length_bucket_batching",    # padding-waste bucket telemetry (r7b)
    "ivm_aggregate_merge",       # base⊎delta IVM merge == recompute (r7b)
    "als_item_step",             # closed-form ALS item half-step (r7b)
    "quantile_normalize_sources",  # cross-source quantile map (r7b)
    "kaplan_meier_survival",     # censored time-to-repeat KM curve (r7b)
    # --- r7 tail (bench backfill, VERDICT r7 item 2/3) ---
    "mmr_rerank",                # decimal-exact MMR diversity rerank (r7b)
    "map_mrr_eval",              # MRR / AP@5 / hits@5 eval trio (r7b)
    "negative_sampling",         # md5-draw implicit negatives (r7b)
    "ivm_join_merge",            # delta-join IVM rule terms (r7b)
    "ols_trend",                 # sufficient-statistic OLS per symbol (r7b)
    "bfs_hops",                  # frontier-join BFS levels (r7b)
    "pmi_collocations",          # rational-lift collocation top-100 (r7b)
    "feature_hashing",           # hashing-trick sparse vectors (r7b)
    "connected_components",      # large/small-star contraction (r7b)
    "rfm_segmentation",          # two-phase quintile segments (r7b)
    "jl_projection",             # frozen Rademacher 64->8 sketch (r7b)
    "stream_hll_merge",          # streaming HLL register merge (r7b)
    # --- round 8 ---
    "stream_ivm_aggregate",      # versioned streaming IVM view (r8)
    "quantile_sketch_merge",     # mergeable MRL quantile summary (r8)
    "weighted_median",           # two-phase exact weighted quartiles (r8)
    "vocab_build",               # frequency-cutoff vocab + coverage (r8)
    "bandit_replay_eval",        # off-policy replay argmax eval (r8)
    "sssp_weighted",             # Bellman-Ford relaxation joins (r8)
    "changepoint_sse",           # prefix-sum SSE changepoint (r8)
    "walk_forward_eval",         # rolling-origin backtest folds (r8)
    "markov_stationary",         # ordered-fold power iteration (r8)
    "kcore_decomposition",       # iterative peel to fixed point (r8)
    "decile_lift_table",         # descending-rank gains table (r8)
    "benford_audit",             # first-digit fraud screen (r8)
    "record_survivorship",       # golden-record field rules (r8)
    "psi_feature_drift",         # binned PSI drift gate (r8)
    "k_anonymity_audit",         # QI class-size release gate (r8)
    "linucb_step",               # contextual-bandit ridge step (r8)
    "assortativity_degree",      # endpoint-degree Pearson (r8)
    "clustering_coefficient",    # per-node oriented triangles (r8)
    "link_prediction_jaccard",   # common-neighbor wedge scores (r8)
    "isotonic_calibration",      # PAV minimax on score bins (r8)
    "decision_stump",            # histogram split scan (r8)
    "naive_bayes_classify",      # bounded-vocab NB train+eval (r8)
    "chi2_feature_selection",    # token-language contingency filter (r8)
    "acf_lags",                  # per-symbol autocorrelation (r8)
    "bootstrap_mean_ci",         # Poissonized bootstrap interval (r8)
    "apriori_triples",           # candidate-pruned frequent triples (r8)
    "spatial_grid_join",         # grid-blocked radius self-join (r8)
    "rank_fusion_rrf",           # hybrid-search rank fusion (r8)
    "hll_set_intersection",      # sketch union-merge + incl-excl (r8)
    "mann_whitney_u",            # nonparametric rank-sum test (r8)
    "em_gmm_step",               # soft-clustering EM step (r8)
    "welch_t_test",              # parametric two-sample test (r8)
    "kruskal_wallis",            # k-group rank ANOVA (r8)
    "roc_auc_eval",              # rank-statistic AUC/Gini (r8)
    "jaccard_prefix_filter_join",  # exact prefix-filter similarity join (r8)
    "phrase_search_positions",   # positional-index phrase search (r8)
    "oov_rate_eval",             # frozen-vocab OOV coverage (r8)
    "hits_hubs_authorities",     # integer-exact HITS power iteration (r8)
    "theil_sen_slope",           # robust pairwise-median trend (r8)
    "cooccurrence_window_weighted",  # GloVe X-matrix builder (r8)
    "bloom_semi_join_pushdown",  # runtime-filter join pruning (r8)
    "char_entropy_quality",      # map-only entropy quality gate (r8)
    "markov_attribution",        # removal-effect chain attribution (r8)
    "join_cardinality_estimate",  # CBO histogram estimate + q-error (r8)
    "gbdt_boost_round",          # histogram-GBDT boosting rounds (r8)
    "ks_test",                   # exact-argmax KS drift test (r8)
    "rank_biased_overlap",       # top-weighted ranker agreement (r8)
    "ohlc_resample_weekly",      # weekly OHLCV downsample bars (r8)
    "sharpe_sortino_daily",      # risk-adjusted return readout (r8)
    # --- round 9 ---
    "stream_psi_drift",          # streaming frozen-edge PSI gate (r9)
    "stream_ks_drift",           # streaming binned-KS gate (r10)
    "dedup_exact_substring",     # verbatim duplicated-span extraction (r10)
    # --- round 11 ---
    "stream_tws_user_stats",     # transformWithStateInPandas via wire shim (r11)
]


def _may_write_artifact(payload: dict, out_path: str) -> bool:
    """Write gates on the COMMITTED artifact. Two rules:

    1. Load gate (VERDICT r13 item 3): a contaminated run may not
       replace a clean one. A contaminated prior may be replaced (most
       recent wins among equals), so a never-idle box still converges
       on the newest run.
    2. Core-count gate (VERDICT r15 item 6): the driver re-runs the
       bench at a LOWER core count to measure scaling, and that run
       used to overwrite the 32-core artifact on disk (BENCH_LOCAL in
       the r15 tree was the 8-core scaling run). A run at fewer cpus
       than a prior artifact taken at more cpus may not replace it;
       artifacts stamp ``cpus`` so the rule (and readers) can tell.

    The full payload always goes to stdout either way."""
    if not os.path.exists(out_path):
        return True
    try:
        with open(out_path) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        # a truncated/corrupt committed artifact is replaceable — raising
        # here would lose the whole sweep's payload AFTER the run
        # finished but BEFORE it printed (ADVICE r14 item 3)
        return True
    prior_cpus = prior.get("cpus")
    if prior_cpus is not None and payload["cpus"] < prior_cpus:
        print(
            f"core-count gate: this run used {payload['cpus']} cpus; "
            f"keeping the prior {prior_cpus}-cpu "
            f"{os.path.basename(out_path)} (scaling runs do not replace "
            "the full-core artifact)",
            file=sys.stderr,
        )
        return False
    if not payload["contaminated"]:
        return True
    prior_clean = (
        not prior.get("contaminated", False)
        and (prior.get("loadavg_start") or 0.0) <= LOAD_GATE
    )
    if prior_clean:
        print(
            f"load gate: loadavg_start {payload['loadavg_start']} > "
            f"{LOAD_GATE}; keeping prior clean "
            f"{os.path.basename(out_path)} (loadavg_start "
            f"{prior.get('loadavg_start')}) — rerun on an idle box to "
            "refresh the committed artifact",
            file=sys.stderr,
        )
        return False
    return True


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = plans.QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# Settle-wait bound (VERDICT r14 item 3): the driver starts bench right
# after its own pytest/oracle stages, so loadavg is often still draining
# from THOSE when the sweep begins — BENCH_r14 shipped stamped
# contaminated at loadavg 10.15 for exactly that reason. Waiting a
# bounded few minutes for the box to settle yields a clean captured line
# when the load is our own wake; if it never settles (genuinely busy
# box), proceed and let the contamination stamp tell the story.
SETTLE_MAX_S = float(os.environ.get("SPARK_GRAFT_SETTLE_S", "300"))
SETTLE_POLL_S = 15.0


def _settle_wait(max_s: float = None) -> dict:
    """Block until 1-min loadavg <= LOAD_GATE or ``max_s`` elapses.
    Returns {"settle_waited_s": s, "settle_timeout": bool} for the
    artifact, so a contaminated-anyway run records that it DID wait."""
    max_s = SETTLE_MAX_S if max_s is None else max_s
    t0 = time.monotonic()
    waited = False
    while os.getloadavg()[0] > LOAD_GATE:
        if time.monotonic() - t0 >= max_s:
            return {"settle_waited_s": round(time.monotonic() - t0, 1),
                    "settle_timeout": True}
        if not waited:
            print(
                f"settle-wait: loadavg {os.getloadavg()[0]:.2f} > "
                f"{LOAD_GATE}; polling up to {max_s:.0f}s for an idle box",
                file=sys.stderr,
            )
            waited = True
        time.sleep(min(SETTLE_POLL_S, max_s))
    return {"settle_waited_s": round(time.monotonic() - t0, 1),
            "settle_timeout": False}


def main() -> None:
    global _LOAD_START
    settle = _settle_wait()
    _LOAD_START = round(os.getloadavg()[0], 2)
    full = "--full" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--full"]
    if argv:
        sf_dir = argv[0]
    elif full:
        # --full's tail audit is only cross-round comparable at its
        # documented sf0.01; honoring the driver's headline env var here
        # silently rewrote BENCH_FULL.json at the wrong scale
        sf_dir = "/root/testdata/sf0.01"
        if os.environ.get("SPARK_GRAFT_SF_DIR"):
            print(
                "note: --full ignores SPARK_GRAFT_SF_DIR and runs at "
                f"{sf_dir}; pass a dir argument to override",
                file=sys.stderr,
            )
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:  # path contains 'sf' not followed by a number
        sf = -1.0
    spark = get_spark("bench")
    # --full sweeps in ALPHABETICAL order, NOT registry order: the
    # registry leads with the round's rotating driver window
    # (plans._PRIORITY), so registry-order sweeps relocated per-family
    # cold-start onto whatever names led that round and made per-query
    # cells incomparable across rounds (the r12 bigram_perplexity 6.2x
    # cell — VERDICT r12 item 3 / PLANS.md "Load adjudication"). A fixed
    # order keeps each query's sweep neighborhood stable regardless of
    # window rotation. Headline mode was always fixed (the HEADLINE
    # list; its order is deliberate cache-adjacency grouping).
    names = sorted(plans.QUERIES) if full else [
        n for n in HEADLINE if n in plans.QUERIES
    ]
    run_once(spark, "cci", sf_dir)  # global JVM/JIT warm-up
    # Python-worker pool warm-up (same rationale as the JVM warm-up: a
    # long-lived cluster's pandas workers are resident; forking 32 workers
    # that each import pandas is one-time start-up cost, not query cost).
    from pyspark.sql import functions as F
    spark.range(64).withColumn("g", F.col("id") % 32).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).write.format("noop").mode("overwrite").save()
    # Streaming-machinery warm-up (VERDICT r12 item 3): the first
    # streaming query of a session additionally pays state-store /
    # micro-batch-engine class loading (~1-2 s), which used to land on
    # whichever stream_* name ran first. Pay it here, on the cheapest
    # streaming query, so every timed cell sees a warm engine.
    if "stream_dedup_watermark" in plans.QUERIES:
        run_once(spark, "stream_dedup_watermark", sf_dir)
        spark.catalog.clearCache()
    timings: dict[str, float] = {}
    # NO clearCache between queries: the bench models a long-lived cluster
    # where the persisted cci/agged subtrees are plan-matched-shared across
    # the pipeline stages (that reuse is a designed property, not leakage).
    # Cache-accumulation hygiene for full-registry sweeps lives in
    # tools/check_oracle.py, which clears between queries.
    for name in names:
        timings[name] = round(run_once(spark, name, sf_dir), 3)
        if full:
            # the tail audit sweeps unrelated families in registry
            # order, so accumulated persisted subtrees are noise (and
            # memory pressure), not designed pipeline reuse
            spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)
    metric = "all_queries_total_sec" if full else "headline_queries_total_sec"
    payload = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "sf_dir": sf_dir,
        "n_queries": len(timings),
        # run order, so any cell can be read with its sweep position
        # (cold-start and cache-adjacency context) next to it — VERDICT
        # r12 item 3's second half
        "order": names,
        # adjudication context (PLANS.md "bench re-baseline after the
        # replans"): the applyInPandas simulator cells are multi-modal
        # in sweep context on shared hosts (best_return measured
        # 6.8-37.8 s across identical-code sweeps while isolated
        # canaries sat at record), and neither attachment nor
        # loadavg-at-start fully explains which mode a sweep lands in —
        # so every artifact records both, and per-cell regression
        # claims for that family go through tools/bench_canary.py
        # (best_win) instead of sweep cells.
        "attached_stdout": sys.stdout.isatty(),
        # core count this sweep ran at (the driver also benches at a
        # lower count for scaling; see _may_write_artifact rule 2)
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "loadavg_start": _LOAD_START,
        "loadavg_end": round(os.getloadavg()[0], 2),
        # cross-round readers: compare only uncontaminated artifacts;
        # a contaminated cell says "box", not "plans" (VERDICT r13 item 3)
        "contaminated": _LOAD_START > LOAD_GATE,
        # settle-wait bookkeeping (VERDICT r14 item 3): a contaminated
        # run that DID wait records the bounded timeout, so the reader
        # knows the box never settled rather than the gate being skipped
        **settle,
    }
    out_file = "BENCH_FULL.json" if full else "BENCH_LOCAL.json"
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), out_file
    )
    if _may_write_artifact(payload, out_path):
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    # full detail as a NON-final line for the log / humans ...
    print(json.dumps(payload))
    # ... and a compact FINAL line (total + 10 slowest) that always fits
    # the driver's bounded tail capture (VERDICT r8 item 3)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(json.dumps({
        "metric": metric,
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "n_queries": len(timings),
        "full_timings": out_file,
        # the driver records THIS line as BENCH_r{N}.json, so the load
        # verdict must travel with it (VERDICT r13 item 3), the
        # settle-wait outcome (VERDICT r14 item 3), and the core count
        # (VERDICT r15 item 6)
        "cpus": payload["cpus"],
        "loadavg_start": _LOAD_START,
        "contaminated": payload["contaminated"],
        **settle,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
