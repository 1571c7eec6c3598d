"""Round-9 additions: streaming PSI drift gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import SF_SMALL


def test_stream_psi_drift_matches_python(spark):
    """The streaming-maintained PSI (frozen base-slice edges, additive
    per-batch histogram merge) must equal a brute-force single-pass
    recompute with the same frozen-edge semantics."""
    from ccirecommenderdatapipeline_spark.operators.lnq import LN_UNIT_SCALE
    from ccirecommenderdatapipeline_spark.plans.events import (
        PSI_BINS,
        PSI_SPLIT_DAY,
    )
    from ccirecommenderdatapipeline_spark.streaming.jobs import (
        stream_psi_drift,
    )

    got = {r["event_type"]: r for r in stream_psi_drift(spark, SF_SMALL).collect()}

    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("event_type", "value", F.dayofmonth("ts").alias("dom"))
        .collect()
    )
    base: dict[str, list[float]] = {}
    cur: dict[str, list[float]] = {}
    for r in ev:
        (base if r["dom"] <= PSI_SPLIT_DAY else cur).setdefault(
            r["event_type"], []
        ).append(r["value"])
    assert set(got) == set(base)  # types with frozen edges only
    for et, b_vals in base.items():
        lo, hi = min(b_vals), max(b_vals)

        def bucket(v: float) -> int:
            if hi == lo:
                return 0
            return min(max(int(math.floor((v - lo) / (hi - lo) * PSI_BINS)), 0),
                       PSI_BINS - 1)

        c_b = [0] * PSI_BINS
        c_c = [0] * PSI_BINS
        for v in b_vals:
            c_b[bucket(v)] += 1
        for v in cur.get(et, []):
            c_c[bucket(v)] += 1
        n_b, n_c = sum(c_b), sum(c_c)
        psi = 0.0
        for k in range(PSI_BINS):
            # r11 nano-nat replay: exact integer numerator over the
            # shared denominator (n_b+B)(n_c+B)
            p = (c_b[k] + 1) / (n_b + PSI_BINS)
            q = (c_c[k] + 1) / (n_c + PSI_BINS)
            v = math.log(p / q) * LN_UNIT_SCALE
            u = int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))
            num = (c_b[k] + 1) * (n_c + PSI_BINS) - (c_c[k] + 1) * (n_b + PSI_BINS)
            psi += (
                num * u / ((n_b + PSI_BINS) * (n_c + PSI_BINS)) / LN_UNIT_SCALE
            )
        row = got[et]
        assert row["n_base"] == n_b and row["n_current"] == n_c, et
        assert abs(row["psi"] - psi) < 1e-7, (et, row["psi"], psi)
        assert row["psi"] >= 0.0 or abs(row["psi"]) < 1e-9, et
