"""Canary-record verdict logic (tools/bench_canary._verdicts).

The records file is the machine-readable half of the r14 load-gate work:
bench deltas are judged against best idle-box minima instead of PLANS.md
prose. Pin the decision table: records move only DOWN and only from
idle runs; verdicts compare with a 5% grace band.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_spec = importlib.util.spec_from_file_location(
    "bench_canary", os.path.join(ROOT, "tools", "bench_canary.py")
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


@pytest.fixture
def records(tmp_path, monkeypatch):
    path = os.path.join(str(tmp_path), "CANARY_RECORDS.json")
    with open(path, "w") as f:
        json.dump({"sf0.01": {"q": 1.0}}, f)
    monkeypatch.setattr(bc, "RECORDS", path)
    return path


def test_at_or_below_record_within_grace(records):
    v = bc._verdicts({"q": {"min": 1.04}}, "sf0.01", 0.5, update=False)
    assert v["q"].startswith("at/below record")


def test_above_record_reports_percent(records):
    v = bc._verdicts({"q": {"min": 1.5}}, "sf0.01", 0.5, update=False)
    assert "ABOVE record 1.0 by 50%" in v["q"]


def test_loaded_box_annotates_verdict(records):
    v = bc._verdicts({"q": {"min": 1.5}}, "sf0.01", 4.0, update=False)
    assert "loaded box" in v["q"]


def test_update_lowers_record_only_when_idle(records):
    bc._verdicts({"q": {"min": 0.8, "runs": [0.8, 0.9, 0.9]}},
                 "sf0.01", 0.5, update=True)
    assert json.load(open(records))["sf0.01"]["q"]["min"] == 0.8
    # a loaded run must NOT move the record, even downward (a busy box
    # can still produce a lucky low min on a cached path)
    bc._verdicts({"q": {"min": 0.5, "runs": [0.5, 0.5, 0.5]}},
                 "sf0.01", 4.0, update=True)
    assert json.load(open(records))["sf0.01"]["q"]["min"] == 0.8


def test_update_never_raises_record(records):
    bc._verdicts({"q": {"min": 2.0, "runs": [2.0, 2.1, 2.2]}},
                 "sf0.01", 0.5, update=True)
    # drifted session: record untouched (still the legacy bare float)
    assert json.load(open(records))["sf0.01"]["q"] == 1.0


def test_new_canary_and_new_sf_get_seeded_on_update(records):
    bc._verdicts({"new": {"min": 3.0, "runs": [3.0, 3.2, 3.1]}},
                 "sf0.1", 0.5, update=True)
    data = json.load(open(records))
    assert data["sf0.1"]["new"]["min"] == 3.0
    assert "__meta__" in data


def test_committed_records_match_canary_set():
    # every committed record name must still be a registered query; a
    # renamed canary would otherwise verdict against nothing forever
    from ccirecommenderdatapipeline_spark import plans

    with open(os.path.join(ROOT, "CANARY_RECORDS.json")) as f:
        recs = json.load(f)
    for sf_tag, entries in recs.items():
        if sf_tag == "__meta__":
            continue
        for name in entries:
            assert name in plans.QUERIES, f"stale record {name} ({sf_tag})"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


# ---- v2 rep-protocol records (VERDICT r14 item 2) ----------------------


def _run(mn, runs=None):
    return {"min": mn, "runs": runs if runs is not None else [mn, mn, mn]}


def test_update_writes_rep_protocol_schema(records):
    bc._verdicts({"q": {"min": 0.8, "runs": [0.9, 0.8, 1.1]}},
                 "sf0.01", 0.5, update=True)
    rec = json.load(open(records))["sf0.01"]["q"]
    assert rec == {"min": 0.8, "reps": 3, "spread": [0.8, 1.1]}


def test_update_refused_under_three_reps(records):
    bc._verdicts({"q": {"min": 0.5, "runs": [0.5, 0.6]}},
                 "sf0.01", 0.5, update=True)
    # record untouched: minima are judged on >=3 same-session reps
    assert json.load(open(records))["sf0.01"]["q"] == 1.0


def test_within_noise_band_is_not_regression(records):
    with open(records, "w") as f:
        json.dump({"sf0.01": {"q": {"min": 15.9, "reps": 3,
                                    "spread": [15.9, 22.5]}}}, f)
    v = bc._verdicts({"q": _run(20.0)}, "sf0.01", 0.5, update=False)
    assert "noise band" in v["q"]
    # ...but a min beyond the band is still a real ABOVE
    v = bc._verdicts({"q": _run(25.0)}, "sf0.01", 0.5, update=False)
    assert v["q"].startswith("ABOVE")


def test_record_matching_session_widens_spread(records):
    with open(records, "w") as f:
        json.dump({"sf0.01": {"q": {"min": 1.0, "reps": 3,
                                    "spread": [1.0, 1.2]}}}, f)
    bc._verdicts({"q": {"min": 1.03, "runs": [1.03, 1.5, 1.3]}},
                 "sf0.01", 0.5, update=True)
    rec = json.load(open(records))["sf0.01"]["q"]
    assert rec["min"] == 1.0  # never raised
    assert rec["spread"] == [1.0, 1.5]  # band widened: session matched record


def test_drifted_session_cannot_pollute_spread(records):
    # an idle-gated but DRIFTED session (min well above record) says
    # nothing about the record's noise band — unioning its spread in
    # would widen the band until real regressions read as noise (the
    # r15 live run did exactly this before the rule existed:
    # best_win 9.2 s session vs 3.49 s record)
    with open(records, "w") as f:
        json.dump({"sf0.01": {"q": {"min": 1.0, "reps": 3,
                                    "spread": [1.0, 1.2]}}}, f)
    bc._verdicts({"q": {"min": 2.5, "runs": [2.5, 3.8, 2.9]}},
                 "sf0.01", 0.5, update=True)
    rec = json.load(open(records))["sf0.01"]["q"]
    assert rec == {"min": 1.0, "reps": 3, "spread": [1.0, 1.2]}


def test_record_beating_session_replaces_spread(records):
    # the band belongs to the record-setting session's conditions
    with open(records, "w") as f:
        json.dump({"sf0.01": {"q": {"min": 1.0, "reps": 3,
                                    "spread": [1.0, 1.9]}}}, f)
    bc._verdicts({"q": {"min": 0.8, "runs": [0.8, 0.9, 0.85]}},
                 "sf0.01", 0.5, update=True)
    rec = json.load(open(records))["sf0.01"]["q"]
    assert rec == {"min": 0.8, "reps": 3, "spread": [0.8, 0.9]}


def test_rebaseline_allows_slower_fresh_record(records):
    v = bc._verdicts({"q": _run(2.0)}, "sf0.01", 0.5, update=True,
                     rebaseline=["q"])
    assert v["q"] == "no record"  # stale entry dropped before verdict
    rec = json.load(open(records))["sf0.01"]["q"]
    assert rec["min"] == 2.0  # deliberately re-baselined ABOVE the old 1.0


def test_meta_merge_preserves_provenance(records):
    data = json.load(open(records))
    data["__meta__"] = {"seeded": "r14 idle-box runs"}
    with open(records, "w") as f:
        json.dump(data, f)
    bc._verdicts({"q": _run(0.7)}, "sf0.01", 0.5, update=True)
    meta = json.load(open(records))["__meta__"]
    assert meta["seeded"] == "r14 idle-box runs"  # ADVICE r14 item 1
    assert "semantics" in meta


def test_legacy_float_record_still_verdicts(records):
    v = bc._verdicts({"q": _run(1.02)}, "sf0.01", 0.5, update=False)
    assert v["q"].startswith("at/below record")


def test_note_survives_record_update(records):
    with open(records, "w") as f:
        json.dump({"sf0.01": {"q": {"min": 1.0, "reps": 3,
                                    "spread": [1.0, 1.2],
                                    "note": "heavy-tailed"}}}, f)
    bc._verdicts({"q": {"min": 0.8, "runs": [0.8, 0.9, 0.85]}},
                 "sf0.01", 0.5, update=True)
    rec = json.load(open(records))["sf0.01"]["q"]
    assert rec["min"] == 0.8
    assert rec["note"] == "heavy-tailed"
