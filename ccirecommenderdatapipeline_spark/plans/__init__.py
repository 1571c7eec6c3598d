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
# the FIRST 50 registered queries only. Round-13 priority window — the
# steady-state verdict rotation (VERDICT r12 item 1), in order:
# (a) names replanned THIS round (r13) — replans out-rank everything
#     (a stale verdict on a changed plan is worse than an old verdict
#     on an unchanged one). Any NEW op added this round also lands
#     here, displacing the (c) tail from the back (rolled so far:
#     conformal_calibration, cms_term_freq, buy_candidates);
# (b) all 38 r6-era names (tools/verdict_age.py r06 row) — the oldest
#     verdicts in the registry;
# (c) the 12 alphabetically-first r7-era names fill the remaining
#     slots. After this window no name's verdict predates r7, keeping
#     the rotation's ~6-round re-verification latency (the freshness
#     gate in tests/test_fingerprints.py keeps replans queued).
_NEW_THIS_ROUND: list[str] = [
    # r13: fingerprint representation moved from the blind
    # __eager_local_result__ marker to the real pre-fold subtree
    # (ADVICE r12 item 3); plan semantics unchanged (verified r12), but
    # the gate can't distinguish representation from replan, so take a
    # fresh verdict.
    "ml_minhash_lsh",
    # r13: the committed r12 baseline for these two was captured BETWEEN
    # the persist rework (a6e2fc1) and the unpersist-before-return fix
    # (cff50d8) and never re-captured, so it pinned a plan shape that no
    # longer existed at r12 close (21 exchanges / 2 InMemoryTableScans
    # vs the real 15 / 0). The r12 driver verdict executed the CURRENT
    # plan, but a hand-stamp can't be distinguished from blessing a real
    # replan — take fresh verdicts instead (PLANS.md r13 note).
    "stream_psi_drift",
    "stream_ks_drift",
    # r13 replan: markov_stationary's 20 eager localCheckpoint jobs
    # replaced by one lazy nested-HOF fold over the single-row
    # vocabulary-bounded matrix (plans/recommender.py) — 11.2 s -> 2.4 s
    # at sf0.1, same IEEE fold-order contract (oracle green at sf0.001 +
    # sf0.01 locally); queue for a fresh driver verdict.
    "markov_stationary",
    # r13 replan: _cov_view gains a fan-out-before-generator repartition
    # (plans/vectors.py) — the N*D^2 cross-moment explode no longer runs
    # on a single file split; cov 17.0 s -> 7.1 s, pca 11.7 s -> 7.9 s
    # in identical fresh sessions at sf0.1 (oracle green at sf0.001 +
    # sf0.01 locally). Both consumers' plans changed; fresh verdicts.
    "embedding_covariance",
    "pca_power_iteration",
    # r13 replan: fan_out (sources/tables.py) before the shingle /
    # fingerprint / signature passes — the documents table is one file
    # split at test SFs, so these generator-amplified stages ran on one
    # core. Identical-session A/B at sf0.1: winnowing 7.9->4.6,
    # minhash 7.1->4.0, simhash 7.9->3.4, corpus 14.2->7.2,
    # exact_substring 6.4->2.1 s. Oracle green at sf0.001 + sf0.01.
    # dedup_clusters/dedup_corpus share the change via _cluster_labels,
    # whose localCheckpoint truncates their fingerprints' view of it —
    # queued explicitly since the gate can't see that replan.
    "winnowing_dedup",
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "dedup_clusters",
    "dedup_corpus",
    "dedup_exact_substring",
    # r13 replan: fan_out before the BOOT_B md5 rep fan-out — orders is
    # one split, so all N*B draws ran on one core (10.5 -> 4.2 s sf0.1;
    # oracle green both SFs).
    "bootstrap_mean_ci",
]

_PRIORITY = list(_NEW_THIS_ROUND)

# (b) the 38 r6-era names
_PRIORITY += [
    "attribution_models", "bigram_lm", "bpe_merge_pairs", "cogroup_asof",
    "compaction_plan", "constraint_checks", "corpus_datasheet",
    "cross_modal_dedup", "cusum_drift", "dedup_containment",
    # (dedup_simhash_hamming moved up into the (a) replan queue in r13)
    "distinctive_terms", "embedding_quantize",
    "entity_resolution_qgram", "event_transitions",
    "explode_outer_battery", "histogram_equiwidth", "hll_distinct",
    "interval_merge", "key_skew_profile", "kmeans_lloyd_step",
    "media_resize", "mixture_resample", "null_ordering_battery",
    "null_safe_join", "param_sql_revenue", "quality_logreg_score",
    "rolling_correlation", "scd2_point_in_time", "schema_evolution_read",
    "seasonality_dow", "semantic_dedup", "stats_correlation",
    "stream_session_agg", "tpch_q19", "training_order_shuffle",
    "training_pipeline", "winsorize_clip",
]

# (c) r7-era fill — 12 slots when (a) is empty; each (a) addition rolls
# one name off this tail (back first). With (a) at 13 names (one of
# them, dedup_simhash_hamming, promoted OUT of the r6 block, which now
# counts 37) the tail keeps 0 slots: ALL twelve r7 names roll to the
# r14 window head (the replan queue takes absolute priority — a
# changed plan with a stale verdict is worse than an unchanged plan
# with an old one).
_TAIL_R7 = [
    "ab_test_zscore", "ann_recall_eval", "best_return",
    "best_return_full_grid", "best_return_per_days_held", "best_win",
    "bloom_membership", "boilerplate_ngram_scrub",
    "brand_transition_matrix", "buy_candidates", "cms_term_freq",
    "conformal_calibration",
]
_PRIORITY += _TAIL_R7[: max(0, 50 - len(_PRIORITY))]
# the window is EXACTLY 50 (tests/test_pipeline.py pins it) — trim
# explicitly so nothing is dropped silently; the cut names are
# enumerated in the NOTE above, and the assertion forces that NOTE to
# be rewritten whenever an (a) addition shifts the cut line. Slice-based
# (never a bare [49] index) so a short list fails with THIS message,
# not an IndexError (ADVICE r10 item 3).
assert _PRIORITY[49:50] == ["winsorize_clip"], (
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
