"""The fold-staging rule as a structural check (VERDICT r9 item 3).

Round 9's costliest perf bug was a fold referenced INSIDE a HOF lambda:
the interpreted HOF re-runs the fold once per element and per output
column (n^2 per row) — bollinger_bands went 27.4 s -> 4.7 s once the
window list and mean were staged as projection columns (commit a9dc780).
``tools/audit_plans._nested_folds_in_lambda`` now flags the shape on the
OPTIMIZED plan, which is the only honest place to look: Catalyst's
CollapseProject re-inlines a naively-staged fold when its column is
referenced exactly once, silently recreating the n^2 form — staging only
survives when the staged column has multiple downstream references (the
cci/bollinger idiom, where the MAD's inner mean IS the SMA output
column).
"""

import os
import sys

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from audit_plans import _nested_folds_in_lambda  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_detector_fires_on_planted_regression(spark):
    """The exact shape that regressed: a per-element lambda re-running a
    fold over the lambda's own input array."""
    df = spark.range(8).select(
        F.array(F.col("id"), F.col("id") + 1, F.col("id") + 2).alias("a")
    )
    bad = df.select(
        F.transform(
            "a",
            lambda x: x
            - F.aggregate(
                "a", F.lit(0).cast("bigint"), lambda acc, y: acc + y
            ),
        ).alias("centered")
    )
    assert _nested_folds_in_lambda(_plan(bad)), (
        "detector must flag a fold inside a HOF lambda"
    )


def test_collapse_project_reinlines_single_use_staging(spark):
    """Document WHY the check runs on the optimized plan: withColumn
    staging with a single downstream reference is undone by
    CollapseProject, so the n^2 shape comes back after optimization."""
    df = spark.range(8).select(
        F.array(F.col("id"), F.col("id") + 1, F.col("id") + 2).alias("a")
    )
    naive = df.withColumn(
        "s", F.aggregate("a", F.lit(0).cast("bigint"), lambda a_, y: a_ + y)
    ).select(F.transform("a", lambda x: x - F.col("s")).alias("centered"))
    assert _nested_folds_in_lambda(_plan(naive)), (
        "single-reference staging should collapse back to the flagged "
        "shape — if this stops failing, CollapseProject got smarter and "
        "the docstring above needs a rewrite"
    )


def test_multi_reference_staging_survives(spark):
    """The sanctioned idiom: the staged fold column is referenced by more
    than one output, so CollapseProject keeps the projection barrier and
    the lambda references a plain attribute."""
    df = spark.range(8).select(
        F.array(F.col("id"), F.col("id") + 1, F.col("id") + 2).alias("a")
    )
    staged = df.withColumn(
        "s", F.aggregate("a", F.lit(0).cast("bigint"), lambda a_, y: a_ + y)
    ).select(
        "s",
        F.transform("a", lambda x: x - F.col("s")).alias("centered"),
    )
    assert not _nested_folds_in_lambda(_plan(staged))


def test_registry_hot_paths_are_staged(spark):
    """The two queries the r9 fix targeted stay clean (the full-registry
    sweep runs in tools/audit_plans.py each round)."""
    from ccirecommenderdatapipeline_spark import plans

    for name in ("cci", "bollinger_bands"):
        txt = _plan(plans.QUERIES[name](spark, SF_SMALL))
        assert not _nested_folds_in_lambda(txt), name


def test_decimal_readout_allowlist_is_registered_and_justified():
    """DECIMAL_READOUT_OK (the r9 hash-red class tripwire) must only name
    registered queries, each with a non-empty justification; the registry
    sweep itself runs in tools/audit_plans.py each round."""
    from audit_plans import DECIMAL_READOUT_OK

    from ccirecommenderdatapipeline_spark import plans

    for name, why in DECIMAL_READOUT_OK.items():
        assert name in plans.QUERIES, name
        assert why.strip(), name


def test_nested_fold_allowlist_names_its_bound_source():
    """NESTED_FOLD_OK entries are collect-in-disguise if re-pointed at an
    open node domain (VERDICT r15 item 7): every justification must name
    the schema column the bound derives from as 'bound source:
    <table.column> domain', so a schema change trips this review gate,
    and must name a registered query."""
    import re

    from audit_plans import NESTED_FOLD_OK

    from ccirecommenderdatapipeline_spark import plans

    assert NESTED_FOLD_OK, "allowlist unexpectedly empty"
    for name, why in NESTED_FOLD_OK.items():
        assert name in plans.QUERIES, name
        m = re.match(r"bound source: (\w+)\.(\w+) domain", why)
        assert m, f"{name}: justification must LEAD with 'bound source: " \
                  f"<table.column> domain — ...'; got: {why[:60]}..."


def test_truncated_filescan_lines_do_not_false_positive():
    """FileScan's DataFilters argument is length-truncated (unbalanced
    parens); the scanner must skip such lines instead of swallowing the
    rest of the plan into a phantom lambda body."""
    txt = (
        "+- FileScan parquet [text#1] DataFilters: [(size(filter(split(x, "
        "lambdafunction(NOT (lambda x_1#6 = \n"
        "+- Filter (aggregate(a#1, 0, lambdafunction((lambda x + lambda y),"
        " lambda x, lambda y, false)) > 0)\n"
    )
    assert _nested_folds_in_lambda(txt) == []


def test_detector_fires_on_raw_global_window(spark):
    """An inline ``Window.partitionBy()`` (whole-relation aggregate
    window, no partition and no order spec) must trip
    _has_unpartitioned_window — the shape VERDICT r10 item 5 found riding
    on another window's registration in decile_lift_table."""
    from pyspark.sql import Window

    from audit_plans import _has_unpartitioned_window

    df = spark.range(8).select(F.col("id"), (F.col("id") % 3).alias("k"))
    bad = df.select(
        "id", F.sum("id").over(Window.partitionBy()).alias("tot")
    )
    assert _has_unpartitioned_window(_plan(bad))
    ok = df.select(
        "id", F.sum("id").over(Window.partitionBy("k")).alias("tot")
    )
    assert not _has_unpartitioned_window(_plan(ok))


def test_bounded_global_window_registers_its_query():
    """bounded_global_window must enroll its carriers in
    BOUNDED_WINDOW_QUERIES exactly like bounded_window, so each global
    window in a plan is covered by its OWN registration."""
    from ccirecommenderdatapipeline_spark.operators.windows import (
        BOUNDED_WINDOW_QUERIES,
        bounded_global_window,
    )

    spec = bounded_global_window(
        bound="test: 1-row aggregate", queries=("__audit_test_only__",)
    )
    try:
        assert BOUNDED_WINDOW_QUERIES["__audit_test_only__"] == (
            "test: 1-row aggregate"
        )
    finally:
        BOUNDED_WINDOW_QUERIES.pop("__audit_test_only__", None)
    assert spec is not None


def test_detector_fires_on_rounded_raw_ln(spark):
    """``round(ln(x), dp>0)`` (the pre-r11 transcendental idiom) must
    trip _rounded_raw_ln; the sanctioned nano-nat form
    (operators/lnq.ln_units) must not."""
    from audit_plans import _rounded_raw_ln

    from ccirecommenderdatapipeline_spark.operators.lnq import ln_units

    df = spark.range(5).select((F.col("id") + 1.0).alias("x"))
    bad = df.select(F.round(F.log("x"), 9).alias("y"))
    assert _rounded_raw_ln(_plan(bad))
    good = df.select(ln_units(F.col("x")).alias("y"))
    assert _rounded_raw_ln(_plan(good)) == []


def test_ln_readout_allowlist_is_registered_and_justified():
    from audit_plans import LN_READOUT_OK

    from ccirecommenderdatapipeline_spark import plans

    for name, why in LN_READOUT_OK.items():
        assert name in plans.QUERIES, name
        assert why.strip(), name
