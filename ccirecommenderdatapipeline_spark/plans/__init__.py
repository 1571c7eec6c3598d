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

# Registration-order budget: the round driver records correctness rows for
# the FIRST 50 registered queries only. Round-5 priority window:
# (a) tpch_q19 — r4's single red row (Spark decimal(27,2) vs DuckDB
#     decimal(38,2) typed-hash mismatch; both engines cast the revenue
#     aggregate to DOUBLE this round);
# (b) the 36 oracle-backed + 4 rows-only ml_* queries that have never
#     received a driver verdict (exactly r4's ROUND-5 ROTATION list; all
#     local-gate/pytest green);
# (c) queries whose PLAN changed this round: knn_ivf (candidate shuffle
#     join replaces the broadcast), best_return (fused-grid derivation);
#     semantic_dedup / ann_recall_eval are already in (b) and gained
#     corpus-scaled codebook / sampling knobs this round.
# Remaining slots backfill with round-5 additions. Every name displaced
# past 50 already has a green row in CORRECTNESS_r{1..4}.json and stays
# covered by tools/check_oracle.py + pytest.
_PRIORITY = [
    # (a) the red row, fixed this round
    "tpch_q19",
    # (b) never driver-verified (r4 rotation list)
    "dedup_containment", "embedding_quantize", "cross_modal_dedup",
    "schema_evolution_read", "ml_tfidf", "ml_minhash_lsh",
    "ml_kmeans_clusters", "ml_logreg_accuracy", "null_safe_join",
    "explode_outer_battery", "null_ordering_battery", "param_sql_revenue",
    "stream_session_agg", "scd2_point_in_time", "event_transitions",
    "attribution_models", "feature_binning", "bigram_lm",
    "constraint_checks", "stats_correlation", "rolling_correlation",
    "histogram_equiwidth", "cogroup_asof", "seasonality_dow",
    "entity_resolution_qgram", "winsorize_clip", "distinctive_terms",
    "cusum_drift", "inventory_clamped", "training_order_shuffle",
    "mixture_resample", "bigram_perplexity", "semantic_dedup",
    "ann_recall_eval", "bpe_merge_pairs", "key_skew_profile",
    "media_resize", "training_pipeline", "quality_logreg_score",
    "corpus_datasheet",
    # (c) plan changed this round (best_win / best_return_per_days_held
    # share best_return's new fused-depth subtree)
    "knn_ivf", "best_return", "best_win", "best_return_per_days_held",
    # (d) round-5 additions fill the window to 50
    "dedup_simhash_hamming", "kmeans_lloyd_step",
    "hll_distinct", "compaction_plan",
    "interval_merge",
]

# ROUND-6 ROTATION: r5 additions registered past the 50-row window (all
# local-gate + pytest green) that will still lack a driver verdict after
# r5's run: pareto_strategies, bloom_membership, hll_merge_sources,
# zorder_pruning_gain, contrastive_triplets, embedding_covariance,
# holt_linear_forecast, pca_power_iteration, rolling_median,
# stream_outer_join. Also re-pin
# the agged_view consumers whose PLAN switched to the fused kernel late in
# r5 (oracle-green locally): recommendations, reco_win,
# reco_revenue_per_days_held, buy_candidates, order_sizing.
# Every other registered
# name has a green row in CORRECTNESS_r{1..5}.json after this round's
# window executes.

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
