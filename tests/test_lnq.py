"""Cross-engine contract of the shared nano-nat quantizer
(operators/lnq.py): Spark's ln_units and DuckDB's ln_units_sql must
produce the SAME BIGINT for the same input double across the value
range the drift/LM queries feed it — ratios far from and near 1,
tiny probabilities, and values just inside the (0, 1) domain where
ln is negative (the half-away-from-zero rounding direction must
agree on negatives)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark.operators.lnq import (
    LN_UNIT_SCALE,
    ln_units,
    ln_units_sql,
)


def test_ln_units_matches_duckdb_on_value_grid(spark):
    # p/q-style ratios: exact int/int doubles, both > 1 and < 1
    vals = [
        (a, b)
        for a in range(1, 60)
        for b in (7, 11, 13, 101, 9973)
    ]
    sdf = spark.createDataFrame(vals, "a LONG, b LONG").select(
        "a",
        "b",
        ln_units(F.col("a") / F.col("b").cast("double")).alias("u"),
    )
    got = {(r["a"], r["b"]): r["u"] for r in sdf.collect()}

    con = duckdb.connect()
    expr = ln_units_sql("a / CAST(b AS DOUBLE)")
    rows = con.execute(
        f"SELECT a, b, {expr} AS u FROM (SELECT UNNEST($1) AS a, "
        f"UNNEST($2) AS b)",
        [[a for a, _ in vals], [b for _, b in vals]],
    ).fetchall()
    want = {(a, b): u for a, b, u in rows}

    assert got == want
    # sanity: the quantum is what the docstring says (and the rounding
    # direction on negatives is half-AWAY-from-zero in both engines)
    import math

    v = math.log(1 / 7) * LN_UNIT_SCALE
    assert got[(1, 7)] == -int(math.floor(-v + 0.5))


def test_ln_units_returns_bigint_column(spark):
    df = spark.range(1, 5).select(
        ln_units((F.col("id") + 1).cast("double")).alias("u")
    )
    assert dict(df.dtypes)["u"] == "bigint"
