"""Driver-verdict freshness report — the input to each round's window plan.

For every registered query: the latest round whose CORRECTNESS_r*.json
contains a row for it (its last external verdict), whether that row was
fully green, and how many names share each age bucket. The rotation rule
this feeds (VERDICT r9 item 5): no query's verdict should trail its last
plan change by more than ~2 rounds, and the oldest verdicts get priority
for the next 50-slot window after (a) fix re-verifications and (b) new
ops.

Usage: python tools/verdict_age.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccirecommenderdatapipeline_spark import plans


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    latest: dict[str, tuple[int, bool]] = {}
    # sort by PARSED round number, not filename: lexicographic order
    # mis-ranks unpadded or 3-digit rounds (r9 > r10, r100 < r11) and a
    # suffixed experiment file would crash int() — skip those with a note
    import re

    dated = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if not m:
            print(f"note: skipping non-round file {os.path.basename(path)}")
            continue
        dated.append((int(m.group(1)), path))
    for rnd, path in sorted(dated):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                # documented rows-only query: the driver's weak check is
                # rows-ran-and-returned (plans/registry.py enforces the
                # skip-reason); count it green at its grade
                green = row.get("spark_rows") is not None
            else:
                green = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match", True)
                    and not row.get("err")
                )
            latest[name] = (rnd, green)

    buckets: dict[int, list[str]] = {}
    never: list[str] = []
    red: list[str] = []
    for name in plans.QUERIES:
        if name not in latest:
            never.append(name)
            continue
        rnd, green = latest[name]
        buckets.setdefault(rnd, []).append(name)
        if not green:
            red.append(f"{name} (r{rnd})")
    for rnd in sorted(buckets):
        names = sorted(buckets[rnd])
        print(f"r{rnd:02d}: {len(names):3d}  {' '.join(names)}")
    print(f"never-verified ({len(never)}): {' '.join(sorted(never))}")
    if red:
        print(f"LAST VERDICT NOT GREEN ({len(red)}): {', '.join(sorted(red))}")
    oldest = min(buckets, default=0)
    print(
        f"window-planning head for next round: the {len(buckets.get(oldest, []))}"
        f" r{oldest}-era names above, then never-verified"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
