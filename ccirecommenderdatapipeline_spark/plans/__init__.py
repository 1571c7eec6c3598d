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
# the FIRST 50 registered queries only. Round-15 priority window — the
# first pure steady-state rotation (VERDICT r14 item 1), adopted
# VERBATIM from tools/plan_window.py's suggestion after committing the
# r14 verdicts into VERIFIED_FINGERPRINTS (which cleared
# pca_power_iteration's replan flag), in order:
# (a) names replanned THIS round (r15) — replans out-rank everything
#     (a stale verdict on a changed plan is worse than an old verdict
#     on an unchanged one). Any NEW op added this round also lands
#     here, displacing the (c) tail from the back;
# (b) all 45 r8-era names (tools/verdict_age.py r08 row) — the oldest
#     verdicts in the registry now that r14 cleared the r7 cohort;
# (c) the alphabetically-first r9-era names fill the remaining slots.
#     After this window no name's verdict predates r9, holding the
#     rotation's ~6-round re-verification latency.
_NEW_THIS_ROUND: list[str] = [
    # r15 optimization-round replans (all four were already in this
    # window's (b) cohort, so the 50-name set is unchanged — they are
    # listed here, and removed from (b) below, because replans out-rank
    # age): the graph-iteration family moved to lazy single-row HOF
    # folds / halved eager checkpoints (PLANS.md r15).
    "kcore_decomposition",
    "sssp_weighted",
    "connected_components",
    "bfs_hops",
    # hits_hubs_authorities joined the fold class in the r15
    # optimization pass (M = A^T A once, 2 matvec rounds in one fold);
    # unlike the four above it was NOT in the (b) cohort, so it
    # displaces `cci` from the (c) tail.
    "hits_hubs_authorities",
    # r15 plan-memo fingerprint refreshes: these four embed a memoized
    # shared view twice in one build, so the two embeddings now share
    # exprIds at the ANALYZED level (__lit_md5__ moved; executed node
    # counts and results unchanged — oracle-verified at all three SFs
    # before the baseline refresh). Queued so the driver re-verdicts
    # the refreshed fingerprints; displaces the rest of the (c) tail.
    "order_sizing",
    "reco_revenue_per_days_held",
    "reco_win",
    "recommendations",
    # r15 optimization replans, batch 2 (OPTIMIZATION_r15.md): both were
    # already in this window's (b) cohort, so the 50-name set is
    # unchanged — listed here and removed from (b) below because
    # replans out-rank age. hll_set_intersection: single-pass
    # distinct-trigram rebuild; apriori_triples: basket-fold
    # (self-join cascade -> one ok shuffle).
    "hll_set_intersection",
    "apriori_triples",
    # r15 optimization replans, batch 3: strategy_agg now serves the
    # shared fused aggregate (Plan B, bit-identical; Plan A stays
    # exercised by trades_sim/best_return_depth3), and agged_view is
    # derived as the search_years='all' slice of agged_years_view (one
    # fused pass serves both persisted views) — pareto_strategies,
    # buy_candidates and the four batch-1 names pick up the extra cache
    # layer. None of these three were in (b); they displace the (b)
    # tail (walk_forward_eval, weighted_median, welch_t_test -> r16).
    "strategy_agg",
    "pareto_strategies",
    "buy_candidates",
    # r15 optimization replans, batch 4: acf_lags folds its five Pearson
    # moments as exact int64 cent units (decimal once per group, not per
    # row). Displaces vocab_build from the (b) tail.
    "acf_lags",
]

_PRIORITY = list(_NEW_THIS_ROUND)

# (b) the 45 r8-era names
_PRIORITY += [
    "assortativity_degree", "bandit_replay_eval",
    "benford_audit", "changepoint_sse",
    "chi2_feature_selection", "clustering_coefficient",
    "decile_lift_table", "decision_stump",
    "em_gmm_step", "feature_hashing",
    "isotonic_calibration", "ivm_aggregate_merge", "ivm_join_merge",
    "jl_projection", "k_anonymity_audit", "kaplan_meier_survival",
    "kruskal_wallis", "link_prediction_jaccard",
    "linucb_step", "mann_whitney_u", "map_mrr_eval", "mmr_rerank",
    "naive_bayes_classify", "negative_sampling", "ols_trend",
    "pmi_collocations", "quantile_normalize_sources",
    "quantile_sketch_merge", "rank_fusion_rrf", "record_survivorship",
    "rfm_segmentation", "spatial_grid_join",
    "stream_hll_merge", "stream_ivm_aggregate", "stream_quantile_sketch",
    "vocab_build", "walk_forward_eval", "weighted_median",
    "welch_t_test",
]

# (c) r9-era fill — 5 slots when (a) is empty; each (a) addition rolls
# one name off this tail (back first). hits_hubs_authorities's (a) slot
# rolled `cci` off; the four r15 plan-memo fingerprint refreshes rolled
# the rest of this tail (cast_battery, buy_signals,
# bloom_semi_join_pushdown, anti_join); batch 3's three names roll the
# (b) tail itself (welch_t_test, weighted_median, walk_forward_eval).
# batch 4 (acf_lags) rolls vocab_build. The r16 window therefore starts
# from: cci, cast_battery, buy_signals, bloom_semi_join_pushdown,
# anti_join, vocab_build, walk_forward_eval, weighted_median,
# welch_t_test, coalesce_bfill.
_TAIL_R9 = [
    "anti_join", "bloom_semi_join_pushdown", "buy_signals",
    "cast_battery", "cci",
]
_PRIORITY += _TAIL_R9[: max(0, 50 - len(_PRIORITY))]
# the window is EXACTLY 50 (tests/test_pipeline.py pins it) — trim
# explicitly so nothing is dropped silently; the cut names are
# enumerated in the (c) NOTE above, and the assertion forces that NOTE
# to be rewritten whenever an (a) addition shifts the cut line.
# Slice-based (never a bare [49] index) so a short list fails with THIS
# message, not an IndexError (ADVICE r10 item 3).
assert _PRIORITY[49:50] == ["stream_quantile_sketch"], (
    "window tail moved — update the (c) NOTE's enumeration of rolled "
    f"names (slots filled: {len(_PRIORITY)}; slot 50 is now "
    f"{_PRIORITY[49:50] or ['<unfilled>']})"
)
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
