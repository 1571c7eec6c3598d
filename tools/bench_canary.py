"""Load-drift adjudicator: isolated canary timings for bench comparisons.

Every cross-round bench delta needs the same question answered first: did
the PLANS get slower, or did the BOX? (r10: feature_hashing; r11:
bootstrap_mean_ci; r12: a host move added a ~1.2x sweep-level factor AND
a registry reorder shifted the sweep's cold-start onto different
queries — see PLANS.md "Load adjudication".) This encodes the
adjudication protocol those rounds ran by hand:

  - a fixed set of PLAN-STABLE canaries (fingerprint-pinned since r10,
    spanning the cost spectrum: a scan-agg, a window-heavy simulator
    readout, a custom-sink roundtrip);
  - one fresh session, each canary warmed once then timed N times
    back-to-back (same-session repetitions remove JVM/session noise);
  - 1-minute loadavg bookends, because external load is the usual culprit
    and invisible in `ps` inside the container.

Reading the output: if canary minima are at-or-below their recorded sweep
times while the sweep total rose, the delta is load — cite this line and
keep the latest artifacts (repo policy, commit 26bb260). If a canary's
MINIMUM rose >30% on an idle box (loadavg bookends low), suspect a real
regression and bisect with tools/bench_compare.py.

Usage: python tools/bench_canary.py [sf_dir] [n_reps]
Prints ONE JSON line: {"canaries": {name: {"runs": [...], "min": s}},
"loadavg": [before, after], "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# plan-stable since r10 (fingerprint-pinned), cheap-to-moderate, spread
# across subsystems so a single hot cache line can't mask drift; r13
# adds the two largest unexplained r12 sweep ratios (VERDICT r12 item 7)
# so their post-host-move isolated baselines are on record — any future
# >30% isolated rise in them is a signal, not host archaeology
CANARIES = [
    "tpch_q1", "best_win", "order_ledger_roundtrip",
    "semantic_dedup", "dedup_simhash_hamming",
    # r14 (VERDICT r13 item 2): the streaming/applyInPandas family — the
    # top cells of BENCH_r13 (stream_psi_drift 12.3 s) and BENCH_FULL
    # (stream_outer_join 14.7 s) — had no isolated baseline, so its
    # sweep-cell swings could only be adjudicated by ad-hoc timing.
    # Timed after the same streaming-engine drain bench.py uses.
    "stream_psi_drift", "stream_outer_join",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    load_before = os.getloadavg()[0]

    # the SAME session builder the bench sweep uses (ADVICE r12 item 1:
    # a canary timed under a different master/shuffle config than the
    # sweep it adjudicates can itself misattribute a delta); get_spark
    # honors SPARK_GRAFT_CPUS / SPARK_GRAFT_MASTER
    from ccirecommenderdatapipeline_spark.session import get_spark

    spark = get_spark("bench-canary")
    spark.sparkContext.setLogLevel("ERROR")
    session_conf = {
        "master": spark.sparkContext.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    import ccirecommenderdatapipeline_spark.plans as plans

    # streaming-machinery warm-up, identical to bench.py's: the first
    # streaming query of a session pays state-store / micro-batch-engine
    # class loading (~1-2 s); drain it on the cheapest streaming query so
    # the stream_* canaries measure steady state, not session start-up
    if "stream_dedup_watermark" in plans.QUERIES:
        plans.QUERIES["stream_dedup_watermark"](spark, sf_dir).count()
        spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in CANARIES:
        fn = plans.QUERIES[name]
        fn(spark, sf_dir).count()  # warm (session + code paths)
        spark.catalog.clearCache()
        runs = []
        for _ in range(n_reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"runs": runs, "min": min(runs)}
    spark.stop()

    print(
        json.dumps(
            {
                "canaries": out,
                "loadavg": [round(load_before, 2), round(os.getloadavg()[0], 2)],
                "sf_dir": sf_dir,
                # so a reader can SEE a config mismatch vs the sweep
                # being adjudicated (ADVICE r12 item 1)
                "session": session_conf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
