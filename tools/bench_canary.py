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
                                    [--rebaseline <name>]...
Prints ONE JSON line: {"canaries": {name: {"runs": [...], "min": s}},
"loadavg": [before, after], "sf_dir": ..., "verdicts": {name: ...}}.

Records: CANARY_RECORDS.json (committed) holds, per (sf_dir tag,
canary), the best idle-box minimum plus the rep protocol that produced
it: ``{"min": s, "reps": n, "spread": [lo, hi]}`` (legacy bare-float
records are read as min-only and upgraded in place on the next idle
``--update-records`` run). Every run prints a per-canary verdict
against the record: at/below (5% grace), within the recorded same-
session noise band (``spread`` — stream_outer_join legitimately ranges
15.9-22.5 s in one session, so a 20 s observation is noise, not
regression), or ABOVE by x%. Regressions are judged on the MIN over
>=3 same-session reps — ``--update-records`` refuses runs with fewer
reps, and refuses when loadavg_start exceeds bench.LOAD_GATE, so a
loaded or under-sampled run can never tighten or pollute the baseline.
Records only move DOWN, and the spread updates only from sessions that
SET or MATCHED the record min — a drifted session's spread measures the
drifted box, and unioning it in would widen the band until real
regressions read as noise; a deliberate
replan of a canary query re-baselines with ``--rebaseline <name>
--update-records``, which deletes the stale entry for this sf tag so
the fresh (possibly slower) minimum can be recorded — note the old
record in PLANS.md first. A canary >30% ABOVE record AND above its
noise band on an idle box is the bisect signal.
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
    # r15 (VERDICT r14 item 5): #1/#2 headline-sweep cell three rounds
    # running (11.9 s r14 sweep vs 7.67 s isolated) and the only top-5
    # cell without a committed isolated baseline until now.
    "stream_tws_user_stats",
]


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORDS = os.path.join(ROOT, "CANARY_RECORDS.json")


def _rec_fields(old) -> tuple[float, list[float] | None]:
    """(min, spread) from a v2 dict record or a legacy bare-float one."""
    if isinstance(old, dict):
        return old["min"], old.get("spread")
    return old, None


def _verdicts(
    out: dict,
    sf_tag: str,
    load_before: float,
    update: bool,
    rebaseline: list[str] | None = None,
) -> dict[str, str]:
    """Compare this run's minima to CANARY_RECORDS.json and (optionally)
    lower the records. Records only move DOWN (spreads may widen), only
    from runs that started under bench.LOAD_GATE AND took >=3 reps per
    canary — a busy or under-sampled run can neither tighten nor pollute
    the baseline. ``rebaseline`` names have their stale entry for this
    sf tag deleted first (the deliberate-replan path: the fresh record
    may legitimately be SLOWER than the one the old plan set)."""
    from bench import LOAD_GATE  # repo root is on sys.path already

    recs: dict = {}
    if os.path.exists(RECORDS):
        with open(RECORDS) as f:
            recs = json.load(f)
    sf_recs = recs.setdefault(sf_tag, {})
    changed = False
    for name in rebaseline or []:
        if sf_recs.pop(name, None) is not None:
            print(
                f"--rebaseline: dropped stale {sf_tag} record for {name}",
                file=sys.stderr,
            )
            changed = True
    verdicts: dict[str, str] = {}
    idle = load_before <= LOAD_GATE
    # the rep protocol is part of the record's meaning: a min over 1-2
    # reps is a weaker statistic than the >=3-rep minima on file
    enough_reps = all(len(r.get("runs", [])) >= 3 for r in out.values())
    may_update = update and idle and enough_reps
    for name, r in out.items():
        old = sf_recs.get(name)
        old_min, old_spread = _rec_fields(old) if old is not None else (None, None)
        if old is None:
            verdicts[name] = "no record"
        elif r["min"] <= old_min * 1.05:
            verdicts[name] = f"at/below record {old_min}"
        elif old_spread and r["min"] <= old_spread[1]:
            verdicts[name] = (
                f"above record {old_min} but within recorded noise band "
                f"{old_spread} — same-session spread, not regression"
            )
        else:
            pct = round((r["min"] / old_min - 1) * 100)
            verdicts[name] = (
                f"ABOVE record {old_min} by {pct}%"
                + ("" if idle else " (loaded box — rerun idle)")
            )
        if may_update:
            # A same-session spread is only a valid NOISE band when the
            # session reproduced the record min (within grace) — a
            # drifted session's spread measures the drifted box, and
            # unioning it in would widen the band until real
            # regressions read as noise. So: a record-beating session
            # REPLACES the spread (the band belongs to the
            # record-setting conditions); a record-matching session
            # widens it; a drifted session touches nothing.
            lo, hi = min(r["runs"]), max(r["runs"])
            if old_min is None or r["min"] < old_min:
                new_rec = {
                    "min": r["min"],
                    "reps": len(r["runs"]),
                    "spread": [lo, hi],
                }
            elif r["min"] <= old_min * 1.05:
                if old_spread:
                    lo, hi = min(lo, old_spread[0]), max(hi, old_spread[1])
                lo = min(lo, old_min)
                new_rec = {
                    "min": old_min,
                    "reps": len(r["runs"]),
                    "spread": [lo, hi],
                }
            else:
                new_rec = old
            if isinstance(old, dict) and isinstance(new_rec, dict):
                # free-text adjudication notes (e.g. documented heavy-
                # tail behavior) survive record updates
                if "note" in old and "note" not in new_rec:
                    new_rec = {**new_rec, "note": old["note"]}
            if new_rec != old:
                sf_recs[name] = new_rec
                changed = True
    if update and not idle:
        print(
            f"--update-records refused: loadavg_start {load_before} > "
            f"{LOAD_GATE}",
            file=sys.stderr,
        )
    if update and not enough_reps:
        print(
            "--update-records refused: <3 reps; records are minima over "
            ">=3 same-session reps",
            file=sys.stderr,
        )
    if changed:
        # merge, don't replace: __meta__ carries provenance keys (e.g.
        # 'seeded') written at commit time (ADVICE r14 item 1)
        recs.setdefault("__meta__", {}).update(
            {
                "semantics": "per (sf tag, canary): best idle-box minimum "
                "over >=3 same-session reps, with the observed same-session "
                "spread [lo, hi] as the noise band; min moves only down, "
                "spread only from sessions that set or matched the record "
                "min, both only from runs with loadavg_start <= "
                "bench.LOAD_GATE and >=3 reps; a deliberate canary replan "
                "re-baselines via --rebaseline <name> --update-records",
            }
        )
        with open(RECORDS, "w") as f:
            json.dump(recs, f, indent=1, sort_keys=True)
    return verdicts


def main() -> int:
    update = "--update-records" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--update-records"]
    rebaseline: list[str] = []
    while "--rebaseline" in argv:
        i = argv.index("--rebaseline")
        rebaseline.append(argv[i + 1])
        del argv[i : i + 2]
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
    verdicts = _verdicts(out, sf_tag, load_before, update, rebaseline)
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
