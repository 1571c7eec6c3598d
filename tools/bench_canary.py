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

Usage: python tools/bench_canary.py [sf_dir] [n_reps] [--update-records]
Prints ONE JSON line: {"canaries": {name: {"runs": [...], "min": s}},
"loadavg": [before, after], "sf_dir": ..., "verdicts": {name: ...}}.

Records: CANARY_RECORDS.json (committed) holds the best idle-box minimum
per (sf_dir tag, canary). Every run prints a per-canary verdict against
the record (at/below, or ABOVE by x%); ``--update-records`` lowers
records from this run's minima — refused when loadavg_start exceeds
bench.LOAD_GATE, so a loaded box can never tighten or pollute the
baseline. A canary >30% ABOVE record on an idle box is the bisect
signal (see module docstring above); records are per-plan-shape, so a
deliberate replan of a canary query re-baselines with --update-records
(after the old record is noted in PLANS.md).
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


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORDS = os.path.join(ROOT, "CANARY_RECORDS.json")


def _verdicts(
    out: dict, sf_tag: str, load_before: float, update: bool
) -> dict[str, str]:
    """Compare this run's minima to CANARY_RECORDS.json and (optionally)
    lower the records. Records only move DOWN, and only from runs that
    started under bench.LOAD_GATE — a busy box can neither tighten nor
    pollute the baseline."""
    from bench import LOAD_GATE  # repo root is on sys.path already

    recs: dict = {}
    if os.path.exists(RECORDS):
        with open(RECORDS) as f:
            recs = json.load(f)
    sf_recs = recs.setdefault(sf_tag, {})
    verdicts: dict[str, str] = {}
    idle = load_before <= LOAD_GATE
    changed = False
    for name, r in out.items():
        old = sf_recs.get(name)
        if old is None:
            verdicts[name] = "no record"
        elif r["min"] <= old * 1.05:
            verdicts[name] = f"at/below record {old}"
        else:
            pct = round((r["min"] / old - 1) * 100)
            verdicts[name] = (
                f"ABOVE record {old} by {pct}%"
                + ("" if idle else " (loaded box — rerun idle)")
            )
        if update and idle and (old is None or r["min"] < old):
            sf_recs[name] = r["min"]
            changed = True
    if update and not idle:
        print(
            f"--update-records refused: loadavg_start {load_before} > "
            f"{LOAD_GATE}",
            file=sys.stderr,
        )
    if changed:
        recs["__meta__"] = {
            "semantics": "best idle-box minimum per (sf tag, canary); "
            "moves only down, only from runs with loadavg_start <= "
            "bench.LOAD_GATE; re-baseline deliberately after a canary "
            "replan",
        }
        with open(RECORDS, "w") as f:
            json.dump(recs, f, indent=1, sort_keys=True)
    return verdicts


def main() -> int:
    update = "--update-records" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--update-records"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    n_reps = int(argv[1]) if len(argv) > 1 else 3
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

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    verdicts = _verdicts(out, sf_tag, load_before, update)
    print(
        json.dumps(
            {
                "canaries": out,
                "loadavg": [round(load_before, 2), round(os.getloadavg()[0], 2)],
                "sf_dir": sf_dir,
                # so a reader can SEE a config mismatch vs the sweep
                # being adjudicated (ADVICE r12 item 1)
                "session": session_conf,
                "verdicts": verdicts,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
