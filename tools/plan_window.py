"""Suggest the next round's 50-slot driver window (the steady-state
rotation chore, mechanized).

Ordering rule (the one plans/__init__.py has applied by hand since r12):

  (a) names whose CURRENT plan fingerprint differs from their newest
      verdict's (replans + never-verified) — a changed plan with a stale
      verdict outranks everything;
  (b) remaining slots fill by verdict age, oldest round first,
      alphabetical within a round.

Prints the ordered window as a paste-ready Python list plus the per-name
reason, and names the first rolled-off entry (the r+2 window head).
This SUGGESTS; plans/__init__.py stays the hand-reviewed source of
truth because replan entries carry prose justifications the generator
cannot write.

Usage: python tools/plan_window.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccirecommenderdatapipeline_spark import plans

WINDOW = 50


def verdict_ages(root: str) -> dict[str, int]:
    """name -> newest round with a CORRECTNESS row (green or not — a red
    name is ALSO queued by (a) via the freshness gate's refresh policy,
    which never advances red fingerprints)."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def replanned(root: str) -> list[str]:
    """Names whose current fingerprint differs from the verified one —
    same comparison freshness_gate makes, minus the is-it-queued check
    (this tool is what DECIDES the queue)."""
    def _load(p):
        with open(p) as f:
            d = json.load(f)
        d.pop("__meta__", None)
        return d

    current = _load(os.path.join(root, "PLAN_FINGERPRINTS.json"))
    verified = _load(os.path.join(root, "VERIFIED_FINGERPRINTS.json"))
    out = []
    for name in plans.QUERIES:
        if current.get(name) != verified.get(name):
            out.append(name)
    return sorted(out)


def suggest(root: str) -> list[tuple[str, str]]:
    ages = verdict_ages(root)
    queue: list[tuple[str, str]] = [
        (n, "replanned/never-verified (fingerprint != newest verdict)")
        for n in replanned(root)
    ]
    queued = {n for n, _ in queue}
    rest = sorted(
        (n for n in plans.QUERIES if n not in queued),
        key=lambda n: (ages.get(n, 0), n),
    )
    queue += [(n, f"verdict age r{ages.get(n, 0)}") for n in rest]
    return queue


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    queue = suggest(root)
    window, rolled = queue[:WINDOW], queue[WINDOW:]
    print(f"# suggested next driver window ({WINDOW} slots):")
    print("_PRIORITY = [")
    for name, why in window:
        print(f'    "{name}",  # {why}')
    print("]")
    if rolled:
        print(
            f"# first rolled-off (next-next window head): {rolled[0][0]} "
            f"({rolled[0][1]}); {len(rolled)} names wait"
        )
    n_replans = sum(
        1 for _, why in window if why.startswith("replanned")
    )
    if n_replans > WINDOW // 2:
        print(
            f"# WARNING: {n_replans} replan slots — more than half the "
            "window; verify the fingerprint baseline was refreshed "
            "(tools/freshness_gate.py --refresh) before trusting this"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
