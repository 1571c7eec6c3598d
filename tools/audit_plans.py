"""Mechanical scale-shape audit: build every registered query's physical
plan (batch plans are analyzed without executing; the few
streaming-wrapped queries run their availableNow micro-batches inside
their plan function and contribute the batch result's plan) and flag the
two unambiguous scale-killers —
``CartesianProduct`` (an unbroadcast cross join materializing |A|x|B|)
and ``BatchEvalPython`` (row-at-a-time Python UDF eval; all sanctioned
Python stages are Arrow-batched: ArrowEvalPython / FlatMapGroupsInPandas
/ MapInPandas / FlatMapCoGroupsInPandas / ...InPandasWithState).

``BroadcastNestedLoopJoin`` is NOT flagged: every occurrence in this repo
is a broadcast of a literal/aggregate-sized grid (strategy combos, probe
grids, scalar counts) — the pattern the simulator mandates — but it is
COUNTED so a new corpus-sized one shows up in review.

Usage: python tools/audit_plans.py [sf_dir]   (exit 1 on any flag)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccirecommenderdatapipeline_spark import plans
from ccirecommenderdatapipeline_spark.session import get_spark

FLAGS = ("CartesianProduct", "BatchEvalPython")
COUNTED = ("BroadcastNestedLoopJoin", "SortMergeJoin")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    flagged: list[tuple[str, str]] = []
    counts = {k: 0 for k in COUNTED}
    errors: list[str] = []
    for name, fn in plans.QUERIES.items():
        try:
            txt = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only plans can't batch-build
            errors.append(f"{name}: {type(e).__name__}")
            continue
        for f in FLAGS:
            if f in txt:
                flagged.append((name, f))
        for c in COUNTED:
            counts[c] += 1 if c in txt else 0
        spark.catalog.clearCache()
    print(f"audited {len(plans.QUERIES) - len(errors)}/{len(plans.QUERIES)} plans")
    for c, n in counts.items():
        print(f"  {c}: {n} queries (informational)")
    if errors:
        print(f"  unbuildable as batch (streaming wrappers): {errors}")
    if flagged:
        for name, f in flagged:
            print(f"[FLAG] {name}: {f}")
        return 1
    print("no CartesianProduct, no row-at-a-time Python eval — clean")
    return 0




def fingerprint(sf_dir: str = "/root/testdata/sf0.01", out_path: str = "PLAN_FINGERPRINTS.json") -> None:
    """Write a per-query physical-plan fingerprint (counts of the load-
    bearing node types) to ``out_path``. Diffing this file between rounds
    catches SILENT plan regressions — a broadcast silently degrading to a
    sort-merge join, a cache stop matching, an extra exchange — that
    correctness gates cannot see.

    Usage: python tools/audit_plans.py --fingerprint [sf_dir]
    """
    import json

    spark = get_spark("plan-fingerprint")
    nodes = (
        "Exchange", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "InMemoryTableScan", "Scan parquet",
        "WindowGroupLimit", "HashAggregate", "ObjectHashAggregate",
    )
    fp: dict[str, dict[str, int]] = {}
    for name, fn in plans.QUERIES.items():
        try:
            txt = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            fp[name] = {"__error__": 1}
            continue
        fp[name] = {n: txt.count(n) for n in nodes if txt.count(n)}
        spark.catalog.clearCache()
    with open(out_path, "w") as f:
        json.dump(fp, f, indent=1, sort_keys=True)
    print(f"wrote {len(fp)} fingerprints to {out_path}")


if __name__ == "__main__":
    if "--fingerprint" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--fingerprint"]
        fingerprint(*args)
        raise SystemExit(0)
    raise SystemExit(main())
