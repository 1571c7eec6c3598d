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
# the FIRST 50 registered queries only. Round-9 priority window — the
# r8 verdict's item 1, verbatim: pay down the 54-name driver-verdict
# debt (new-op volume is deliberately paused this round so the
# rotation finally catches the tail):
# (a) the 16 round-8 ops registered past the r8 window (locally
#     oracle-verified in r8, independently re-verified by the r8
#     judge; never driver-verified);
# (b) NEW ops added this round (first verdicts out-rank re-checks) —
#     kept small on purpose; each addition displaces one (d) name;
# (c) the 20 r1-era names displaced across r5-r8 rotations (every one
#     r1-green, plan unchanged since, local-gate green every round);
# (d) backfill with the next-oldest driver verdicts (remaining
#     round-1 rows), trimmed so the window is exactly 50.
_PRIORITY = [
    # (a) round-8 additions never driver-verified
    "roc_auc_eval", "jaccard_prefix_filter_join",
    "phrase_search_positions", "oov_rate_eval",
    "hits_hubs_authorities", "theil_sen_slope",
    "cooccurrence_window_weighted",
    "bloom_semi_join_pushdown", "char_entropy_quality",
    "markov_attribution",
    "join_cardinality_estimate", "gbdt_boost_round",
    "ks_test", "rank_biased_overlap",
    "ohlc_resample_weekly", "sharpe_sortino_daily",
]

# (b) new this round — appended as each op lands so it claims a window
# slot from the (d) backfill, never from (a)/(c).
_NEW_THIS_ROUND: list[str] = [
    "stream_psi_drift",
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

# (d) the 18 _BACKFILL names (displaced from the r8 window by that
# round's (b) additions); 50 - 16(a) - len(b) - 20(c) of them fit.
# NOTE (round-9 open): with (b) empty, the first 14 fit (through
# `top1_per_group`); the last 4 (`trading_calendar`, `union_dedup`,
# `upsert_keep_last`, `window_lag_running`) roll to round 10 — after
# which every registered name has a driver verdict under its current
# plan, closing the rotation debt tracked since r5.
_BACKFILL = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "doc_fingerprints", "grouped_multi_agg", "lang_id",
    "order_reconciliation", "rollup_counts", "simhash_groups",
    "sort_limit", "star_join_revenue", "symbol_universe", "text_stats",
    "top1_per_group", "trading_calendar", "union_dedup",
    "upsert_keep_last", "window_lag_running",
]
_PRIORITY += _BACKFILL[: max(0, 50 - len(_PRIORITY))]
# the window is EXACTLY 50 (tests/test_pipeline.py pins it) — trim
# explicitly so nothing is dropped silently; the cut names are
# enumerated in the NOTE above.
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
