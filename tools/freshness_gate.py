"""Fingerprint-vs-verdict freshness gate (VERDICT r11 item 6).

The driver's correctness verdicts attach to the plan that existed when
the verdict was taken. A plan change after the verdict silently orphans
it — the failure mode that accumulated 48 stale names across rounds
4-11. This module makes that state machine-checked:

- ``VERIFIED_FINGERPRINTS.json`` (committed) records, per query name,
  the physical-plan fingerprint its NEWEST driver verdict attached to
  (seeded from the round-11-close PLAN_FINGERPRINTS.json, which
  tests/test_fingerprints.py had held stable since each verdict).
- ``stale_names()`` returns every registered name whose CURRENT
  fingerprint differs from its verified one and which is NOT queued in
  the next driver window (``plans._PRIORITY``). tests/test_fingerprints.py
  asserts this is empty, so a replan that forgets to queue the name
  fails the suite immediately instead of surfacing in a judge audit.
- ``--refresh CORRECTNESS_r<N>.json`` is run once when a round's
  verdicts land: every GREEN name's verified fingerprint is advanced to
  the current PLAN_FINGERPRINTS.json entry (red/errored names keep the
  old snapshot — their newest verdict is still the old one).

Known limit (inherited from the fingerprint design): fingerprints are
STRUCTURAL node counts, so a literal-only replan (e.g. the r11 nano-nat
constant change) does not move them and stays a manual queueing duty —
the gate catches the structural class, which is what the backlog was
made of.

Usage:
    python tools/freshness_gate.py                # report (exit 1 if stale)
    python tools/freshness_gate.py --refresh CORRECTNESS_r12.json
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CURRENT = os.path.join(ROOT, "PLAN_FINGERPRINTS.json")
VERIFIED = os.path.join(ROOT, "VERIFIED_FINGERPRINTS.json")


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    d.pop("__meta__", None)
    return d


def stale_names(
    current: dict, verified: dict, priority: list[str], registry: list[str]
) -> list[str]:
    """Names whose current fingerprint is newer than their newest driver
    verdict and which are not queued for the next window. A name missing
    from ``verified`` (never verified) OR from ``current`` (never
    baselined) is stale unless queued — new ops must claim a window slot
    the round they land (membership is checked explicitly: a name absent
    from BOTH dicts would otherwise compare None == None and slip the
    fast gate until the slow Spark baseline check ran)."""
    return sorted(
        n
        for n in registry
        if (
            n not in current
            or n not in verified
            or current[n] != verified[n]
        )
        and n not in priority
    )


def is_green(row: dict) -> bool:
    """A driver verdict row counts as green only when every recorded
    comparison passed and no error fired (rows-only rows have
    hash_match absent/None — they still advance freshness: the verdict
    the driver CAN take was taken)."""
    if row.get("err"):
        return False
    checks = [row.get("rows_match"), row.get("schema_match"), row.get("hash_match")]
    return all(c is not False for c in checks) and any(c for c in checks)


def _fingerprints_at_verdict(correctness_path: str) -> dict | None:
    """PLAN_FINGERPRINTS.json as of the commit that last touched the
    CORRECTNESS file — the snapshot the driver's verdicts actually
    attached to. Stamping from the WORKING-TREE fingerprints instead
    would silently bless any replan that landed between the driver run
    and ``--refresh`` (the verdict vouches for the old plan, not the
    new one). Returns None when git can't resolve it (untracked file,
    no repo) — callers fall back to the working tree with a warning."""
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", ROOT, "log", "-n", "1", "--format=%H", "--",
             os.path.abspath(correctness_path)],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not commit:
            return None
        blob = subprocess.run(
            ["git", "-C", ROOT, "show", f"{commit}:PLAN_FINGERPRINTS.json"],
            capture_output=True, text=True, check=True,
        ).stdout
        d = json.loads(blob)
        d.pop("__meta__", None)
        return d
    except (subprocess.CalledProcessError, OSError, json.JSONDecodeError):
        return None


def refresh(correctness_path: str) -> int:
    current = _fingerprints_at_verdict(correctness_path)
    if current is None:
        print(
            "WARNING: CORRECTNESS file not resolvable in git — stamping "
            "from working-tree PLAN_FINGERPRINTS.json; any replan since "
            "the driver run would be silently blessed. Run --refresh "
            "before replanning."
        )
        current = _load(CURRENT)
    with open(VERIFIED) as f:
        verified = json.load(f)
    meta = verified.pop("__meta__", {})
    rows = _load(correctness_path)
    advanced = []
    for name, row in rows.items():
        if name in current and is_green(row):
            if verified.get(name) != current[name]:
                advanced.append(name)
            verified[name] = current[name]
    meta["last_refresh"] = os.path.basename(correctness_path)
    out = {"__meta__": meta}
    out.update({k: verified[k] for k in sorted(verified)})
    with open(VERIFIED, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"advanced {len(advanced)} verified fingerprints from "
        f"{os.path.basename(correctness_path)}: {advanced}"
    )
    return 0


def report() -> int:
    sys.path.insert(0, ROOT)
    from ccirecommenderdatapipeline_spark.plans import QUERIES, _PRIORITY

    stale = stale_names(_load(CURRENT), _load(VERIFIED), _PRIORITY, list(QUERIES))
    if stale:
        print(f"STALE ({len(stale)}) — replanned without queueing: {stale}")
        return 1
    print("freshness gate clean: every replanned name is queued")
    return 0


if __name__ == "__main__":
    if "--refresh" in sys.argv:
        raise SystemExit(refresh(sys.argv[sys.argv.index("--refresh") + 1]))
    raise SystemExit(report())
