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
# the FIRST 50 registered queries only. Round-11 priority window — the
# r10 verdict's items 1 and 2, in order:
# (a) the 4 MLlib wrappers, upgraded this round from rows-only to
#     statistic-level oracles (r10 verdict item 2) — first cross-engine
#     verdicts ever for these names, so they head the window;
# (b) NEW ops added this round (first verdicts out-rank re-checks) —
#     each addition displaces one (e) tail name, never (a)/(c)/(d);
# (c) the 7 streaming/SCD names rolled from the r10 window's (f) tail
#     (enumerated in the r10 NOTE; r10 verdict item 1);
# (d) the 33 remaining round-3-era names — after this window no verdict
#     is older than r4;
# (e) tail: the oldest round-4-era verdicts, TPC-H first (they exercise
#     SURVEY's W6/J5 core), trimmed so the window is exactly 50. The
#     r12 backfill pool is the rest of the 47 r4-era names
#     (tools/verdict_age.py prints the authoritative list).
_PRIORITY = [
    # (a) MLlib wrappers, oracle-backed for the first time this round
    "ml_tfidf", "ml_minhash_lsh", "ml_kmeans_clusters",
    "ml_logreg_accuracy",
]

# (b) new this round — appended as each op lands so it claims a window
# slot from the (e) tail, never from (a)/(c)/(d).
_NEW_THIS_ROUND: list[str] = [
    # first-ever driver verdict: registered unconditionally once the
    # vendored protobuf wire shim landed (VERDICT r10 item 3)
    "stream_tws_user_stats",
]

_PRIORITY += _NEW_THIS_ROUND

_PRIORITY += [
    # (c) the 7 names rolled from the r10 tail
    "stream_dedup_watermark", "stream_stateful_counts",
    "stream_stream_join", "session_windows", "scd2_dimension",
    "interval_join_attribution", "sliding_window_agg",
    # (d) the 33 remaining r3-era names (oldest driver verdicts left)
    "array_agg_ops", "bm25_search", "contamination_check", "corpus_mix",
    "csv_roundtrip", "funnel_analysis", "gap_fill_daily",
    "grouping_sets_agg", "heavy_hitters", "hierarchy_rollup",
    "hierarchy_walk", "jsonl_roundtrip", "lateral_topk", "map_json_ops",
    "media_features", "media_frame_sample", "orc_roundtrip",
    "percentile_battery", "pii_scrub", "posexplode_tokens",
    "quality_filtered_corpus", "quality_gopher", "repetition_ratios",
    "retention_cohorts", "rollup_multires", "session_window_builtin",
    "sketch_accuracy", "tfidf_sql", "token_histogram", "trades_sim",
    "tumbling_window_agg", "unpivot_measures", "vector_centroids",
]

# (e) round-4-era tail: groups (a)-(d) total 45 names (4 + 1 + 7 + 33),
# so 5 slots remain and the first 5 below fit (through `tpch_q9`); the
# other 3 listed (`tpch_q10`, `tpch_q11`, `tpch_q12`) roll to round 12 along with
# the remaining r4-era names (the r12 backfill pool). Count verified by
# the assertion below — NOT by hand (the r9 and r10 drafts of this NOTE
# both miscounted by hand).
_TAIL_R4 = [
    "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10",
    "tpch_q11", "tpch_q12",
]
_PRIORITY += _TAIL_R4[: max(0, 50 - len(_PRIORITY))]
# the window is EXACTLY 50 (tests/test_pipeline.py pins it) — trim
# explicitly so nothing is dropped silently; the cut names are
# enumerated in the NOTE above, and the assertion forces that NOTE to
# be rewritten whenever a (b) addition shifts the cut line. Slice-based
# (never a bare [49] index) so a short list fails with THIS message,
# not an IndexError (ADVICE r10 item 3).
assert _PRIORITY[49:50] == ["tpch_q9"], (
    "window tail moved — update the (e) NOTE's enumeration of rolled "
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
