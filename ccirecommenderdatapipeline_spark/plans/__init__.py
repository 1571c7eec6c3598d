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
# the FIRST 50 registered queries only. Round-4 priority window:
# (a) sequence_packing — r3's single red row (oracle HUGEINT-vs-BIGINT cast,
#     fixed this round) PLUS a plan change (two-phase bucketed prefix sum);
# (b) the 21 round-3 queries registered past the 50-row budget that have
#     never received a driver verdict (local gate + pytest green only):
#     7 late TPC-H, the 4 price indicators, 5 analytics batteries,
#     2 streaming, pagerank, media_dedup, corpus_pipeline;
# (c) queries whose PLAN changed this round (prefix-sum rework touches
#     corpus_pipeline, already in (b); doc_chunking gained the empty-doc
#     guard; best_return_full_grid gained a driver oracle).
# Remaining slots backfill with round-4 additions. Every name displaced
# past 50 already has a green row in CORRECTNESS_r{1,2,3}.json and stays
# covered by tools/check_oracle.py + pytest.
_PRIORITY = [
    # (a) the red row + plan change
    "sequence_packing",
    # (b) never driver-verified round-3 queries
    "tpch_q4", "tpch_q10", "tpch_q12", "tpch_q14", "tpch_q16",
    "tpch_q19", "tpch_q22",
    "bollinger_bands", "max_drawdown", "ewma_latest", "rsi_simple",
    "rank_battery2", "collated_grouping", "xml_extract",
    "variant_json_stats", "salted_join",
    "stream_merge_upsert", "stream_static_join",
    "pagerank_bipartite", "media_dedup", "corpus_pipeline",
    # (c) plan changed this round
    "doc_chunking", "best_return_full_grid",
    # (d) round-4 additions
    "tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
    "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q20", "tpch_q21",
    "best_return_depth3",
    "cluster_margin", "winnowing_dedup", "range_interval_window",
    # (c cont.) restaged through a parquet staging table this round
    "stream_execution_feed",
    "dedup_incremental", "order_ledger_roundtrip", "linear_interpolate",
    "udtf_chunker", "dpp_partitioned_join",
    # (d cont.) warehouse-maintenance breadth (plans/warehouse.py) — fills
    # the remaining slots of the 50-row driver window
    "data_profile", "cdc_apply", "zorder_layout", "entity_resolution",
    "anomaly_mad", "vwap_monthly",
]

# ROUND-5 ROTATION: after r4's driver run, exactly these registered
# names (the 4 genuinely rows-only ml_* stages; the rest oracle-backed) will
# still lack a driver verdict — all local-gate/pytest green. Set round 5's
# _PRIORITY to them first, then backfill with plan-changed representatives:
#   dedup_containment, embedding_quantize, cross_modal_dedup,
#   schema_evolution_read, ml_tfidf, ml_minhash_lsh, ml_kmeans_clusters,
#   ml_logreg_accuracy, null_safe_join, explode_outer_battery,
#   null_ordering_battery, param_sql_revenue, stream_session_agg,
#   scd2_point_in_time, event_transitions, attribution_models,
#   feature_binning, bigram_lm, constraint_checks, stats_correlation,
#   rolling_correlation, histogram_equiwidth, cogroup_asof,
#   seasonality_dow, entity_resolution_qgram, winsorize_clip,
#   distinctive_terms, cusum_drift, inventory_clamped,
#   training_order_shuffle, mixture_resample, bigram_perplexity,
#   semantic_dedup, ann_recall_eval, bpe_merge_pairs, key_skew_profile,
#   media_resize, training_pipeline, quality_logreg_score,
#   corpus_datasheet


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
