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
    bc._verdicts({"q": {"min": 0.8}}, "sf0.01", 0.5, update=True)
    assert json.load(open(records))["sf0.01"]["q"] == 0.8
    # a loaded run must NOT move the record, even downward (a busy box
    # can still produce a lucky low min on a cached path)
    bc._verdicts({"q": {"min": 0.5}}, "sf0.01", 4.0, update=True)
    assert json.load(open(records))["sf0.01"]["q"] == 0.8


def test_update_never_raises_record(records):
    bc._verdicts({"q": {"min": 2.0}}, "sf0.01", 0.5, update=True)
    assert json.load(open(records))["sf0.01"]["q"] == 1.0


def test_new_canary_and_new_sf_get_seeded_on_update(records):
    bc._verdicts({"new": {"min": 3.0}}, "sf0.1", 0.5, update=True)
    data = json.load(open(records))
    assert data["sf0.1"]["new"] == 3.0
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
