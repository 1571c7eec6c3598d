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

Since r13 the fingerprints carry ``__lit_md5__`` — a literal-sensitive
canonicalized-plan hash (tools/audit_plans.canonical_hash) alongside the
structural node counts — so a literal-only replan (the r11 nano-nat
constant class, the gate's former documented blind spot) now moves the
fingerprint and trips the gate automatically.

Usage:
    python tools/freshness_gate.py                # report (exit 1 if stale)
    python tools/freshness_gate.py --refresh CORRECTNESS_r12.json
    python tools/freshness_gate.py --adopt        # schema migration, see adopt()
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
        dirty = subprocess.run(
            ["git", "-C", ROOT, "status", "--porcelain", "--",
             os.path.abspath(correctness_path)],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if dirty:
            # tracked-but-modified: the working-tree verdict rows are
            # NEWER than the commit whose fingerprint snapshot we're
            # about to stamp from — a confusing silent mismatch (ADVICE
            # r12 item 2). Conservative direction (false-stale), but say
            # so out loud.
            print(
                f"WARNING: {os.path.basename(correctness_path)} has "
                "uncommitted changes; stamping green rows with the "
                "fingerprint snapshot of its LAST COMMIT, which may "
                "predate the working-tree verdicts. Commit the driver "
                "artifacts first for an exact stamp."
            )
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


# Dimensions added to the fingerprint schema AFTER verdicts were first
# recorded; --adopt migrates them into VERIFIED without a re-verdict.
NEW_DIMS = frozenset({"__lit_md5__"})


def adopt() -> int:
    """One-time migration when the fingerprint schema gains a dimension
    (r13: ``__lit_md5__``): for every name whose CURRENT fingerprint
    equals its verified one on all previously-recorded dimensions, adopt
    the full current entry (new dimensions included) into
    VERIFIED_FINGERPRINTS.json.

    Sound ONLY at a drift-clean tree — run it BEFORE any replanning, at
    the state the round-close verdict certified (fingerprint_diff exit 0
    on the old dimensions), so the adopted hash describes exactly the
    plan the newest verdict executed. A name whose old dimensions
    mismatch is left alone (it is a real replan, not a schema migration
    — the gate must keep flagging it until queued)."""
    current = _load(CURRENT)
    with open(VERIFIED) as f:
        verified = json.load(f)
    meta = verified.pop("__meta__", {})
    adopted, left = [], []
    for name, cur in current.items():
        old_dims = {k: v for k, v in cur.items() if k not in NEW_DIMS}
        if name not in verified:
            continue  # never verified — stays a queueing duty
        if verified[name] == old_dims and verified[name] != cur:
            verified[name] = cur
            adopted.append(name)
        elif verified[name] != cur:
            left.append(name)
    out = {"__meta__": meta}
    out.update({k: verified[k] for k in sorted(verified)})
    with open(VERIFIED, "w") as f:
        json.dump(out, f, indent=1)
    print(f"adopted new fingerprint dimensions for {len(adopted)} names")
    if left:
        print(
            f"left alone (old dimensions differ — real replans, must be "
            f"queued): {left}"
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
    if "--adopt" in sys.argv:
        raise SystemExit(adopt())
    raise SystemExit(report())
