"""Dump formatted physical plans for every registered query plus a one-line
audit summary (exchanges, join strategies, pushed filters, read schemas).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Writes plans to /tmp/spark_graft_plans/<query>.txt and prints the summary.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccirecommenderdatapipeline_spark import plans
from ccirecommenderdatapipeline_spark.session import get_spark

OUT_DIR = "/tmp/spark_graft_plans"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(plans.QUERIES)
    spark = get_spark("explain-audit")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        if name.startswith("stream_"):  # streaming plans need a query start
            print(f"{name:32s} (streaming - skipped)")
            continue
        try:
            df = plans.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}")
            continue
        with open(os.path.join(OUT_DIR, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        pushed = sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", txt)) - {""})

        # count ONLY the numbered operator-detail headers ("(n) Op"):
        # formatted explain prints every operator twice (tree + detail),
        # so naive substring counts were ~2x, and bare 'Exchange' also
        # matched BroadcastExchange/ReusedExchange — conflating broadcast
        # traffic with real shuffles, the one distinction this audit
        # line exists to surface
        def op(pat: str) -> int:
            return len(re.findall(rf"^\(\d+\) {pat}\b", txt, re.M))

        print(
            f"{name:32s} exch={op('Exchange'):2d} "
            f"bhj={op('BroadcastHashJoin')} smj={op('SortMergeJoin')} "
            f"bnlj={op('BroadcastNestedLoopJoin')} "
            f"scans={op('Scan parquet')} "
            f"pushed={'y' if pushed else '-'}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
