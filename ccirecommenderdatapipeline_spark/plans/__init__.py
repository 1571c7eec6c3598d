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
# the FIRST 50 registered queries only. Round-10 priority window — the
# r9 verdict's items 1, 2 and 5, in order:
# (a) the 3 r9 hash-mismatch ops, re-verified after their decimal
#     readout columns were flattened to portable primitives (r9 verdict
#     item 1) — these MUST head the window so the fix gets a verdict;
# (b) NEW ops added this round (first verdicts out-rank re-checks) —
#     each addition displaces one (f) tail name, never (a)/(c)/(d);
# (c) the 5 names still carrying round-1 driver verdicts — the last of
#     the rotation debt tracked since r5 (r9 verdict item 2); after
#     this window every registered name has a post-r1 verdict;
# (d) names whose PLAN changed in the r9 determinism commits
#     (47d27d8/62eccc4) after their last driver verdict — the verdict
#     must catch up to the plan (r9 verdict item 5's freshness rule);
# (e) all 29 names whose latest driver verdict is round-2 era;
# (f) tail: the oldest round-3-era verdicts, TPC-H and streaming
#     families first, trimmed so the window is exactly 50.
_PRIORITY = [
    # (a) r9 hash-red trio, readouts flattened this round
    "hits_hubs_authorities", "cooccurrence_window_weighted",
    "char_entropy_quality",
]

# (b) new this round — appended as each op lands so it claims a window
# slot from the (f) tail, never from (a)/(c)/(d)/(e).
_NEW_THIS_ROUND: list[str] = [
    "stream_ks_drift",
    "dedup_exact_substring",
]

_PRIORITY += _NEW_THIS_ROUND

_PRIORITY += [
    # (c) the last 5 r1-era names (r9 verdict item 2)
    "top1_per_group", "trading_calendar", "union_dedup",
    "upsert_keep_last", "window_lag_running",
    # (d) plan changed after last verdict: r9 determinism commits
    # (r3/r4/r6 verdicts) plus the two r10 decimal-readout-idiom edits
    # (ADVICE r9 item 2; r9 verdicts, values identical at test SFs but
    # the freshness rule wants the verdict to follow the plan)
    "min_cost_supplier", "cdc_apply", "inventory_clamped",
    "grouped_multi_agg", "star_join_revenue",
    # (e) the 29 r2-era names (complete list, oldest verdicts left)
    "asof_join", "broker_balances", "broker_position_pnl",
    "checkpoint_roundtrip", "coerce_battery", "cube_counts",
    "dedup_clusters", "dedup_corpus", "embedding_dedup_cosine",
    "embedding_dedup_lsh", "head_n_per_type", "incremental_merge",
    "intersect_keys", "knn_brute_force", "latest_partition",
    "media_catalog", "pivot_status_priority", "rank_battery",
    "relative_date_window", "salted_agg", "sample_bernoulli",
    "sample_stratified", "scalar_roundtrips", "sell_decisions",
    "strategy_agg", "string_battery", "train_test_split",
    "union_missing_columns", "window_range_frame",
]

# (f) round-3-era tail: groups (a)-(e) total 44 names
# (3 + 2 + 5 + 5 + 29), so 6 slots remain and the first 6 below fit
# (through `stream_tumbling_agg`); the other 7 (`stream_dedup_
# watermark`, `stream_stateful_counts`, `stream_stream_join`,
# `session_windows`, `scd2_dimension`, `interval_join_attribution`,
# `sliding_window_agg`) roll to round 11 along with the remaining ~34
# r3-era names (the r11 backfill pool). Count verified by the
# assertion below — NOT by hand (the r9 and r10 drafts of this NOTE
# both miscounted by hand).
_TAIL_R3 = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q18",
    "stream_tumbling_agg", "stream_dedup_watermark",
    "stream_stateful_counts", "stream_stream_join",
    "session_windows", "scd2_dimension", "interval_join_attribution",
    "sliding_window_agg",
]
_PRIORITY += _TAIL_R3[: max(0, 50 - len(_PRIORITY))]
# the window is EXACTLY 50 (tests/test_pipeline.py pins it) — trim
# explicitly so nothing is dropped silently; the cut names are
# enumerated in the NOTE above, and the assertion forces that NOTE to
# be rewritten whenever a (b)/(d) addition shifts the cut line.
assert _PRIORITY[49] == "stream_tumbling_agg", (
    "window tail moved — update the (f) NOTE's enumeration of rolled "
    f"names (slot 50 is now {_PRIORITY[49]!r})"
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
