"""Reference-parity tests: Spark CCI vs the exact pandas formulas of
/root/reference/daily_function.py:584-595 (recomputed independently here —
no code is copied, only the published CCI definition)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark.operators.windows import with_buy_signal, with_cci
from ccirecommenderdatapipeline_spark.sources.prices import prices_view
from tests.conftest import SF_SMALL


def pandas_cci(pdf: pd.DataFrame, n: int = 20) -> pd.DataFrame:
    """Independent pandas implementation of the standard CCI definition."""
    out = []
    for _, g in pdf.groupby("symbol"):
        g = g.sort_values("date").reset_index(drop=True)
        for side, px in (("close", "close_pr"), ("open", "open_pr")):
            tp = (g["high_pr"] + g["low_pr"] + g[px]) / 3
            sma = tp.rolling(n).mean()
            mad = tp.rolling(n).apply(lambda x: np.mean(np.abs(x - np.mean(x))), raw=True)
            g[f"{side}_TP"] = tp
            g[f"{side}_sma"] = sma
            g[f"{side}_mad"] = mad
            g[f"{side}_cci"] = (tp - sma) / (0.015 * mad)
        out.append(g)
    return pd.concat(out, ignore_index=True)


def test_cci_matches_pandas_reference(spark):
    prices = prices_view(spark, SF_SMALL)
    got = with_cci(prices).toPandas()
    exp = pandas_cci(prices.toPandas())
    merged = got.merge(
        exp, on=["symbol", "date"], suffixes=("", "_exp"), validate="one_to_one"
    )
    assert len(merged) == len(got) > 0
    for c in ["close_TP", "open_TP", "close_sma", "open_sma",
              "close_mad", "open_mad", "close_cci", "open_cci"]:
        a, b = merged[c].astype(float), merged[f"{c}_exp"].astype(float)
        both = a.notna() & b.notna()
        # null pattern must match exactly (pandas NaN for partial windows)
        assert (a.isna() == b.isna()).all(), c
        assert np.allclose(a[both], b[both], rtol=1e-9, atol=1e-9), c


def test_partial_windows_are_null(spark):
    cci = with_cci(prices_view(spark, SF_SMALL))
    first_rows = (
        cci.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("symbol").orderBy("date")
            ),
        )
        .filter("rn < 20")
    )
    assert first_rows.filter(F.col("close_cci").isNotNull()).count() == 0
    assert cci.filter("close_cci is not null").count() > 0


def test_buy_signal_crossover_semantics(spark):
    """Strict crossover (daily_function.py:724-725): prev < thr AND cur > thr."""
    cci = with_cci(prices_view(spark, SF_SMALL))
    sig = with_buy_signal(cci, -100.0, strict=True).toPandas()
    for _, g in sig.groupby("symbol"):
        g = g.sort_values("date").reset_index(drop=True)
        prev = g["open_cci"].shift(1)
        exp = (prev < -100.0) & (g["open_cci"] > -100.0)
        assert (g["buy_signal"] == exp.fillna(False)).all()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"symbol", "condition_holding_days", "win_rate", "revenue_rate"} <= set(
        df.columns
    )


def test_registry_consistency():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 5


def test_holt_forecast_matches_python_reference(spark):
    from ccirecommenderdatapipeline_spark import plans
    from ccirecommenderdatapipeline_spark.plans.cci import HOLT_H
    from tests.conftest import SF_SMALL

    out = {r["symbol"]: r for r in
           plans.QUERIES["holt_linear_forecast"](spark, SF_SMALL).collect()}
    pr = plans.QUERIES["prices"](spark, SF_SMALL).collect()
    series = {}
    for r in pr:
        series.setdefault(r["symbol"], []).append((r["date"], r["close_pr"]))
    for sym, rows in series.items():
        xs = [v for _, v in sorted(rows)]
        if len(xs) < 2:
            assert sym not in out
            continue
        l, b = xs[0], xs[1] - xs[0]
        for y in xs[2:]:
            nl = 0.5 * y + 0.5 * (l + b)
            b = 0.25 * (nl - l) + 0.75 * b
            l = nl
        r = out[sym]
        assert r["level"] == round(l, 6)
        assert r["trend"] == round(b, 6)
        assert r["forecast_h5"] == round(l + HOLT_H * b, 6)


def test_rolling_median_is_order_statistic(spark):
    from ccirecommenderdatapipeline_spark import plans
    from ccirecommenderdatapipeline_spark.plans.cci import MED_W
    from tests.conftest import SF_SMALL
    import statistics

    rows = plans.QUERIES["rolling_median"](spark, SF_SMALL).collect()
    series = {}
    for r in sorted(rows, key=lambda r: (r["symbol"], r["date"])):
        series.setdefault(r["symbol"], []).append(r)
    for sym, rs in series.items():
        closes = [r["close_pr"] for r in rs]
        for idx, r in enumerate(rs):
            if idx + 1 < MED_W:
                assert r["med21"] is None
            else:
                window = closes[idx - MED_W + 1: idx + 1]
                assert r["med21"] == statistics.median(window)
                assert r["med21"] in window  # order statistic, not interpolated
