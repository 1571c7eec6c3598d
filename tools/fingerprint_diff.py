"""Plan-regression tripwire (VERDICT r7 item 8): rebuild every query's
physical-plan fingerprint and diff it against the committed
PLAN_FINGERPRINTS.json. A drifted entry means a plan changed since the
baseline was taken — broadcast degraded to sort-merge, a cache stopped
matching, an extra exchange appeared — which correctness gates cannot
see. Run at round close (and after any batch of plan edits), BEFORE
refreshing the baseline:

    python tools/fingerprint_diff.py [sf_dir] [--run-streaming]

Exit 0 = no drift (new queries listed informationally); exit 1 = drift,
with a per-query node-count diff. Refresh the baseline only after
explaining every drifted line:

    python tools/audit_plans.py --fingerprint [sf_dir] [--run-streaming]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audit_plans import fingerprint  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "PLAN_FINGERPRINTS.json")


def main() -> int:
    run_streaming = "--run-streaming" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--run-streaming"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    with open(BASELINE) as f:
        base = json.load(f)
    # Plans are SF-dependent (static size estimates cross broadcast
    # thresholds between SFs — tpch_q7 is BHJx5 at sf0.001 but
    # SMJx1/BHJx4 at sf0.01+; adjudicated r9). Comparing a run at one
    # SF against a baseline taken at another reports phantom drift, so
    # refuse outright.
    base_sf = base.pop("__meta__", {}).get("sf_dir")
    if base_sf is not None and base_sf != sf_dir:
        print(
            f"REFUSED: baseline {BASELINE} was taken at {base_sf}, this "
            f"run is {sf_dir}; plans are SF-dependent. Re-run at "
            f"{base_sf} (phantom drift otherwise — see tpch_q7, r9)."
        )
        return 2
    tmp = os.path.join(tempfile.mkdtemp(prefix="fpdiff_"), "fp.json")
    fingerprint(sf_dir, tmp, run_streaming=run_streaming)
    with open(tmp) as f:
        now = json.load(f)
    now.pop("__meta__", None)
    new = sorted(set(now) - set(base))
    gone = sorted(set(base) - set(now))
    drift = {
        n: (base[n], now[n])
        for n in set(base) & set(now)
        if base[n] != now[n]
        # a streaming-skip marker vs a real fingerprint is a mode
        # difference, not plan drift
        and not (
            "__streaming_skipped__" in base[n] or "__streaming_skipped__" in now[n]
        )
        # likewise the legacy eager-local-result marker vs the prefold
        # fingerprint that replaced it (audit_plans _prefold_builders,
        # r13): a marker baseline vs real counts is a representation
        # migration, not plan drift
        and not (
            "__eager_local_result__" in base[n]
            or "__eager_local_result__" in now[n]
        )
    }
    if new:
        print(f"new queries (no baseline yet): {new}")
    if gone:
        print(f"removed queries (stale baseline entries): {gone}")
    if drift:
        print(f"PLAN DRIFT in {len(drift)} queries:")
        for n, (b, c) in sorted(drift.items()):
            keys = sorted(set(b) | set(c))
            delta = {k: (b.get(k, 0), c.get(k, 0)) for k in keys if b.get(k) != c.get(k)}
            print(f"  {n}: {delta}")
        return 1
    print(f"no plan drift across {len(set(base) & set(now))} baselined queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
