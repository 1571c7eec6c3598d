"""Compare two bench JSON records (BENCH_r*.json or raw bench.py output).

Prints per-query ratios over the common subset plus common/total sums, so
round-over-round regressions are separable from suite growth. The driver's
BENCH_r*.json wraps the bench line under "tail"/"parsed"; raw bench.py
output is the JSON line itself — both accepted.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_flag_threshold]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = json.loads(txt.strip().splitlines()[-1])
    if "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' record found")
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    common = [k for k in nq if k in oq]
    rows = sorted(common, key=lambda k: nq[k] / oq[k], reverse=True)
    worst = 0.0
    print(f"{'query':32} {'old':>8} {'new':>8} {'ratio':>7}")
    for k in rows:
        r = nq[k] / oq[k]
        worst = max(worst, r)
        mark = "  <-- regressed" if r > flag else ""
        print(f"{k:32} {oq[k]:8.2f} {nq[k]:8.2f} {r:7.2f}{mark}")
    co, cn = sum(oq[k] for k in common), sum(nq[k] for k in common)
    print(f"\ncommon-{len(common)} sum: {co:.1f}s -> {cn:.1f}s ({cn / co:.2f}x)")
    print(f"full totals:  old {old['value']:.1f}s ({len(oq)} q), "
          f"new {new['value']:.1f}s ({len(nq)} q)")
    only_new = [k for k in nq if k not in oq]
    if only_new:
        print(f"new-only queries: {', '.join(only_new)} "
              f"(+{sum(nq[k] for k in only_new):.1f}s)")
    return 1 if worst > flag else 0


if __name__ == "__main__":
    sys.exit(main())
