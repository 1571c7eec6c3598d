"""Committed-bench-artifact load gate (VERDICT r13 item 3).

r13 committed a 301.7 s sweep taken at loadavg 4.97 over a same-code
255.0 s idle-box run because the artifact policy was "latest run wins"
with no idle-ness condition — the cross-round headline read as a
regression that wasn't one. bench._may_write_artifact encodes the fix;
these tests pin its decision table without running a sweep.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402


def _payload(load: float, cpus: int = 32) -> dict:
    return {
        "loadavg_start": load,
        "contaminated": load > bench.LOAD_GATE,
        "cpus": cpus,
    }


def _write(tmp_path, load: float) -> str:
    p = os.path.join(tmp_path, "BENCH_LOCAL.json")
    with open(p, "w") as f:
        json.dump(_payload(load), f)
    return p


def test_clean_run_always_writes(tmp_path):
    prior = _write(str(tmp_path), 0.5)
    assert bench._may_write_artifact(_payload(0.8), prior)


def test_contaminated_run_keeps_clean_prior(tmp_path, capsys):
    prior = _write(str(tmp_path), 0.5)
    assert not bench._may_write_artifact(_payload(3.2), prior)
    assert "load gate" in capsys.readouterr().err


def test_contaminated_run_replaces_contaminated_prior(tmp_path):
    # most recent wins among equals: a never-idle box still converges
    # on the newest run instead of pinning a stale artifact forever
    prior = _write(str(tmp_path), 4.97)
    assert bench._may_write_artifact(_payload(3.2), prior)


def test_first_artifact_always_writes(tmp_path):
    missing = os.path.join(str(tmp_path), "BENCH_LOCAL.json")
    assert bench._may_write_artifact(_payload(9.9), missing)


def test_pre_gate_artifacts_count_as_clean_by_loadavg(tmp_path):
    # artifacts written before the gate existed have loadavg_start but
    # no "contaminated" key — classify them by the recorded loadavg
    p = os.path.join(str(tmp_path), "BENCH_LOCAL.json")
    with open(p, "w") as f:
        json.dump({"loadavg_start": 0.9}, f)
    assert not bench._may_write_artifact(_payload(2.0), p)
    with open(p, "w") as f:
        json.dump({"loadavg_start": 4.66}, f)
    assert bench._may_write_artifact(_payload(2.0), p)


def test_module_level_load_start_default():
    # ADVICE r13 item 1: references outside main() must not NameError
    assert bench._LOAD_START is None or isinstance(bench._LOAD_START, float)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_corrupt_prior_is_replaceable(tmp_path):
    # a truncated committed artifact must not raise AFTER the sweep ran
    # but BEFORE its payload printed (ADVICE r14 item 3)
    p = os.path.join(str(tmp_path), "BENCH_LOCAL.json")
    with open(p, "w") as f:
        f.write('{"loadavg_start": 0.5, "contam')
    assert bench._may_write_artifact(_payload(3.2), p)


def test_settle_wait_returns_immediately_when_idle(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.2, 0.2))
    out = bench._settle_wait(max_s=60)
    assert out["settle_timeout"] is False
    assert out["settle_waited_s"] < 1.0


def test_settle_wait_times_out_on_busy_box(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    clock = iter([0.0, 0.05, 0.1])  # monotonic readings
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(clock, 99.0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._settle_wait(max_s=0.08)
    assert out["settle_timeout"] is True


def test_low_core_run_keeps_full_core_prior(tmp_path, capsys):
    # VERDICT r15 item 6: the driver's 8-core scaling run must not
    # replace the committed 32-core artifact, even when the low-core
    # run is clean
    p = os.path.join(str(tmp_path), "BENCH_LOCAL.json")
    with open(p, "w") as f:
        json.dump(_payload(0.5, cpus=32), f)
    assert not bench._may_write_artifact(_payload(0.4, cpus=8), p)
    assert "core-count gate" in capsys.readouterr().err


def test_equal_or_higher_core_run_may_write(tmp_path):
    p = os.path.join(str(tmp_path), "BENCH_LOCAL.json")
    with open(p, "w") as f:
        json.dump(_payload(0.5, cpus=8), f)
    assert bench._may_write_artifact(_payload(0.4, cpus=32), p)
    with open(p, "w") as f:
        json.dump(_payload(0.5, cpus=32), f)
    assert bench._may_write_artifact(_payload(0.4, cpus=32), p)


def test_pre_stamp_prior_has_no_core_gate(tmp_path):
    # artifacts written before the cpus stamp existed are classified
    # only by the load gate
    p = os.path.join(str(tmp_path), "BENCH_LOCAL.json")
    with open(p, "w") as f:
        json.dump({"loadavg_start": 0.5, "contaminated": False}, f)
    assert bench._may_write_artifact(_payload(0.4, cpus=8), p)


def test_settle_wait_unblocks_when_load_drains(monkeypatch):
    loads = iter([(5.0,) * 3, (5.0,) * 3, (0.3,) * 3])
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: next(loads, (0.3,) * 3)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._settle_wait(max_s=600)
    assert out["settle_timeout"] is False
