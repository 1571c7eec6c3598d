"""Property-based parity for the two-phase bucketed prefix sum: on
ARBITRARY (doc_id, source, n_tokens) tables — sparse ids, duplicate
sources, skewed sizes — ``_with_start_tok`` must equal the naive
single-window cumsum it replaced."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F

from ccirecommenderdatapipeline_spark.plans.corpus import _with_start_tok


@st.composite
def sized_rows(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    return [
        (
            doc_id,
            draw(st.sampled_from(["a", "b", "c"])),
            draw(st.integers(min_value=0, max_value=5_000)),
        )
        for doc_id in ids
    ]


@settings(max_examples=12, deadline=None)
@given(rows=sized_rows())
def test_two_phase_prefix_sum_matches_naive_window(spark, rows):
    sized = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, n_tokens LONG"
    )
    got = {
        (r["doc_id"]): r["start_tok"]
        for r in _with_start_tok(sized, "n_tokens").collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["doc_id"]: r["start_tok"]
        for r in sized.withColumn(
            "start_tok", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
        ).collect()
    }
    assert got == want
