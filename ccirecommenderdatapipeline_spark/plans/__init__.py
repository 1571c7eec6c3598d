"""Query registry — the driver contract surface.

Importing this package registers every query; ``QUERIES`` / ``ORACLES`` feed
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from .registry import QUERIES, ORACLES, query

from . import cci  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import simulator  # noqa: E402,F401
from . import lifecycle  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import storage  # noqa: E402,F401
from . import mllib  # noqa: E402,F401
from . import broker  # noqa: E402,F401
from . import northstar  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import warehouse  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import recommender  # noqa: E402,F401

# Registration-order budget: the round driver records correctness rows for
# the FIRST 50 registered queries only. Round-8 priority window — after
# this round EVERY registered query has a driver verdict under its
# current plan:
# (a) the 16 round-7 ops registered past the r7 window (local
#     check_oracle green in r7; never driver-verified);
# (b) NEW ops added this round (first verdicts out-rank re-checks) —
#     kept in a separate list so additions automatically shrink (d);
# (c) the 20 r1-era names displaced across r5-r7 rotations (every one
#     r1-green, plan unchanged since, local-gate green every round);
# (d) backfill to exactly 50 with the next-oldest driver verdicts
#     (remaining round-1 rows).
_PRIORITY = [
    # (a) round-7 additions never driver-verified
    "mmr_rerank", "ivm_aggregate_merge", "als_item_step",
    "stream_hll_merge", "quantile_normalize_sources",
    "kaplan_meier_survival", "map_mrr_eval", "negative_sampling",
    "ivm_join_merge", "ols_trend", "bfs_hops", "pmi_collocations",
    "feature_hashing", "connected_components", "rfm_segmentation",
    "jl_projection",
]

# (b) new this round — appended as each op lands so it claims a window
# slot from the (d) backfill, never from (a)/(c).
_NEW_THIS_ROUND: list[str] = [
    "stream_ivm_aggregate", "quantile_sketch_merge", "weighted_median",
    "vocab_build", "bandit_replay_eval", "sssp_weighted",
    "changepoint_sse", "walk_forward_eval", "stream_quantile_sketch",
    "markov_stationary", "kcore_decomposition", "decile_lift_table",
    "benford_audit", "record_survivorship", "psi_feature_drift",
    "k_anonymity_audit", "linucb_step", "assortativity_degree",
    "clustering_coefficient", "link_prediction_jaccard",
    "isotonic_calibration", "decision_stump",
    "naive_bayes_classify", "chi2_feature_selection",
    "acf_lags", "bootstrap_mean_ci",
    "apriori_triples", "spatial_grid_join", "rank_fusion_rrf",
    "hll_set_intersection", "mann_whitney_u", "em_gmm_step",
    "welch_t_test", "kruskal_wallis", "roc_auc_eval",
    "jaccard_prefix_filter_join", "phrase_search_positions",
    "oov_rate_eval",
    "hits_hubs_authorities", "theil_sen_slope",
    "cooccurrence_window_weighted",
    "bloom_semi_join_pushdown", "char_entropy_quality",
    "markov_attribution",
    "join_cardinality_estimate", "gbdt_boost_round",
    "ks_test", "rank_biased_overlap",
    "ohlc_resample_weekly", "sharpe_sortino_daily",
]

_PRIORITY += _NEW_THIS_ROUND

_PRIORITY += [
    # (c) displaced r1-era names (oldest driver verdicts in the registry)
    "prices", "cci", "buy_signals", "anti_join", "semi_join",
    "update_join", "cross_grid", "quantile_disc", "regex_json_extract",
    "json_get_k", "cast_battery", "date_arith", "scalar_minmax",
    "lookup_join", "filter_conjunctive", "when_otherwise",
    "coalesce_bfill", "signal_counts", "latest_cci", "proj_rename",
]

# (d) next-oldest (round-1) verdicts, trimmed so the window is exactly 50.
# NOTE (round-8 close): 50 new ops grew (b) past the 50-slot window —
# the window is (a)16 + the first 34 of (b) (through `kruskal_wallis`).
# The 16 newest (b) ops (`roc_auc_eval` .. `sharpe_sortino_daily`), all
# 20 (c) names (r1-green, plans unchanged, locally re-gated this
# round) and every _BACKFILL name roll to the round-9 rotation; the 16
# new ones are locally oracle-verified at sf0.001+sf0.01 this round.
# New first-verdict code out-ranks freshness re-checks, per the
# standing policy above: every (b) op has NO driver verdict yet, while
# every displaced name has an r1-green one.
_BACKFILL = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "doc_fingerprints", "grouped_multi_agg", "lang_id",
    "order_reconciliation", "rollup_counts", "simhash_groups",
    "sort_limit", "star_join_revenue", "symbol_universe", "text_stats",
    "top1_per_group", "trading_calendar", "union_dedup",
    "upsert_keep_last", "window_lag_running",
]
_PRIORITY += _BACKFILL[: max(0, 50 - len(_PRIORITY))]
# the window is EXACTLY 50 (tests/test_pipeline.py pins it): with (b) at
# 32 the (c) tail overflows — trim explicitly so nothing is dropped
# silently; the cut names are enumerated in the NOTE above.
_PRIORITY = _PRIORITY[:50]


def _reorder() -> None:
    ordered = [n for n in _PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _PRIORITY
    ]
    q_snap, o_snap = dict(QUERIES), dict(ORACLES)
    QUERIES.clear()
    QUERIES.update({n: q_snap[n] for n in ordered})
    ORACLES.clear()
    ORACLES.update({n: o_snap[n] for n in ordered if n in o_snap})


_reorder()

__all__ = ["QUERIES", "ORACLES", "query"]
