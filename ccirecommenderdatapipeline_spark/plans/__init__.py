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
# the FIRST 50 registered queries only. Round-7 priority window:
# (a) the 15 names with no driver verdict under their current plans —
#     10 late-round-5 additions registered past the window plus the 5
#     fused agged_view consumers whose plans switched late in round 5
#     (all local-gate + pytest green since then);
# (b) queries whose PLAN changed THIS round: feature_binning (global
#     NTILE -> two-phase bucketed rank), knn_ivf (corpus-scaled ceil(
#     sqrt(N)) codebook; ann_recall_eval / contrastive_triplets compose
#     its plan+oracle), and the fused-kernel consumers affected by the
#     sequential-summation hardening (best_return / best_win /
#     best_return_per_days_held / best_return_full_grid; the reco and
#     agged_view families are already in (a));
# (c) backfill to 50 with the names whose newest driver verdict is
#     round 1 — the oldest rows — so they get re-verified under today's
#     code. Every displaced name keeps a green row in CORRECTNESS_r{1..6}
#     and stays covered by tools/check_oracle.py + pytest.
_PRIORITY = [
    # (a) never driver-verified under current plan (round-6 rotation list,
    # two rounds overdue)
    "pareto_strategies", "bloom_membership", "hll_merge_sources",
    "zorder_pruning_gain", "contrastive_triplets", "embedding_covariance",
    "holt_linear_forecast", "pca_power_iteration", "rolling_median",
    "stream_outer_join",
    "recommendations", "reco_win", "reco_revenue_per_days_held",
    "buy_candidates", "order_sizing",
    # (b) plan changed this round
    "feature_binning", "knn_ivf", "ann_recall_eval",
    "best_return", "best_win", "best_return_per_days_held",
    "best_return_full_grid",
    # (c) round-1-verdict backfill: NONE this round — all 20 r1-era
    # names displaced; every (d) entry below is a NEW op needing its
    # FIRST driver verdict, which out-ranks freshness re-checks.
    # (prices/anti_join/semi_join/update_join/cross_grid/quantile_disc/
    # regex_json_extract/json_get_k/cast_battery/date_arith/scalar_minmax/
    # lookup_join/filter_conjunctive/when_otherwise/coalesce_bfill/
    # signal_counts/latest_cci/proj_rename/cci/buy_signals displaced
    # to keep the window at 50 as (d) grew —
    # each keeps its r1 green row and local gate coverage; new code must
    # out-rank old re-verification)
    # (d) new this round (never driver-verified)
    "boilerplate_ngram_scrub", "token_budget_selection",
    "weighted_sample_wr", "cms_term_freq", "corpus_drift_kl",
    "embedding_truncation_recall", "cube_grouping_battery",
    "stream_cms_merge",
    "market_basket_pairs", "item_item_cosine",
    "logreg_gd_step", "length_bucket_batching",
    "brand_transition_matrix", "decayed_popularity", "reco_candidates",
    "ab_test_zscore", "rendezvous_sharding", "triangle_count_oriented",
    "logreg_calibration_bins",
    "target_encoding_loo", "ndcg_eval", "stream_decayed_popularity",
    "dp_noisy_counts", "propensity_ipw", "reco_coverage_gini",
    "conformal_calibration", "info_gain_features", "fairness_metrics",
]

# Registered past the 50-row window this round (local oracle + pytest
# green; FIRST candidates for the round-8 rotation): mmr_rerank,
# ivm_aggregate_merge, als_item_step, stream_hll_merge,
# quantile_normalize_sources, kaplan_meier_survival, plus any later
# round-7 additions and the 20
# displaced (c) names above.

# After this round's window executes, the r5/r6 backlog of 15 verdict-less
# queries is cleared by (a), the plan changes are re-verified by (b), and
# all 28 round-7 additions are in (d). Still driver-unverified after r7:
# the 20 displaced (c) names (all r1-green, plans unchanged) — rotate them
# back in round 8 along with whatever plans change next.

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
