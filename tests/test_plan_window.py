"""Window-suggester mechanics (tools/plan_window.py).

No equality pin against the live plans._PRIORITY — the suggestion
changes the moment a new CORRECTNESS file lands, by design. Instead pin
the ordering rule on synthetic inputs, plus one live sanity: at the
round the current window was built, the tool and the hand-built list
must agree on the window HEAD class (every replanned name precedes
every age-filled name).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_spec = importlib.util.spec_from_file_location(
    "plan_window", os.path.join(ROOT, "tools", "plan_window.py")
)
pw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pw)


def test_replans_outrank_age_and_age_orders_rest(monkeypatch):
    monkeypatch.setattr(pw, "replanned", lambda root: ["zzz_replanned"])
    monkeypatch.setattr(
        pw, "verdict_ages", lambda root: {"aaa": 9, "bbb": 7, "ccc": 8}
    )
    monkeypatch.setattr(
        pw.plans, "QUERIES",
        {n: None for n in ["aaa", "bbb", "ccc", "zzz_replanned"]},
    )
    order = [n for n, _ in pw.suggest("ignored")]
    assert order == ["zzz_replanned", "bbb", "ccc", "aaa"]


def test_never_verified_sorts_oldest(monkeypatch):
    monkeypatch.setattr(pw, "replanned", lambda root: [])
    monkeypatch.setattr(pw, "verdict_ages", lambda root: {"old": 7})
    monkeypatch.setattr(
        pw.plans, "QUERIES", {"old": None, "brand_new": None}
    )
    order = [n for n, _ in pw.suggest("ignored")]
    # age 0 (never verified) precedes any real verdict age
    assert order == ["brand_new", "old"]


def test_live_suggestion_is_well_formed():
    queue = pw.suggest(ROOT)
    names = [n for n, _ in queue]
    # covers the whole registry exactly once
    from ccirecommenderdatapipeline_spark import plans

    assert sorted(names) == sorted(plans.QUERIES)
    # replan block is a PREFIX: no age-filled name before a replanned one
    kinds = [why.startswith("replanned") for _, why in queue]
    assert kinds == sorted(kinds, reverse=True)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
