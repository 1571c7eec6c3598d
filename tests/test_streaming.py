"""Structured Streaming semantics tests (SURVEY.md §2.9 T1-T6):
- watermark append mode withholds exactly the windows not yet closed;
- two-phase incremental ingestion through a foreachBatch MERGE equals the
  one-shot batch result (T2/T3);
- applyInPandasWithState carries state across micro-batches (T6).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark.sources.tables import load_table
from ccirecommenderdatapipeline_spark.streaming.jobs import (
    events_stream,
    read_upsert_target,
    run_to_memory,
    stage_events_dir,
    stateful_user_counts,
    tumbling_agg_plan,
    upsert_foreach_batch,
)
from tests.conftest import SF_SMALL


def test_watermark_append_withholds_open_windows(spark):
    staged = stage_events_dir(spark, SF_SMALL)
    sdf = events_stream(spark, staged).withWatermark("ts", "1 hour")
    appended = run_to_memory(tumbling_agg_plan(sdf), "append").toPandas()

    batch = tumbling_agg_plan(load_table(spark, SF_SMALL, "events")).toPandas()
    max_us = load_table(spark, SF_SMALL, "events").agg(
        F.max(F.unix_micros("ts"))
    ).first()[0]
    watermark_us = max_us - 3_600_000_000
    closed = batch[batch["w_end_us"] <= watermark_us]
    open_ = batch[batch["w_end_us"] > watermark_us]
    assert len(open_) > 0  # the fixture does leave windows open
    got = set(appended["w_start_us"])
    assert got == set(closed["w_start_us"])


def test_incremental_foreach_batch_upsert_equals_oneshot(spark):
    ev = load_table(spark, SF_SMALL, "events")
    cut_hi = ev.approxQuantile("event_id", [0.6], 0.0)[0]
    cut_lo = ev.approxQuantile("event_id", [0.4], 0.0)[0]
    work = tempfile.mkdtemp()
    src, target, ckpt = f"{work}/src", f"{work}/target", f"{work}/ckpt"

    # phase 1: first 60% of events arrive
    ev.filter(F.col("event_id") <= cut_hi).write.mode("overwrite").parquet(src)

    def run_phase():
        sdf = events_stream(spark, src)
        q = (
            sdf.writeStream.foreachBatch(upsert_foreach_batch(target))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    run_phase()
    n_phase1 = read_upsert_target(spark, target).count()

    # phase 2: an OVERLAPPING batch arrives (40%..100% — the 40-60% band is
    # re-delivered, as in the reference's overlapping re-fetch, T3); the
    # file source only picks up NEW files, the MERGE view dedups re-delivery
    overlap = tempfile.mkdtemp()
    ev.filter(F.col("event_id") >= cut_lo).write.mode("overwrite").parquet(overlap)
    for i, f in enumerate(glob.glob(f"{overlap}/part-*.parquet")):
        shutil.copy(f, f"{src}/late-{i}.parquet")
    run_phase()

    merged = read_upsert_target(spark, target)
    assert merged.count() == ev.count() > n_phase1
    assert merged.select(F.sum("event_id")).first()[0] == ev.select(F.sum("event_id")).first()[0]


def test_stateful_counts_across_microbatches(spark):
    staged = stage_events_dir(spark, SF_SMALL, n_files=4)
    ckpt = tempfile.mkdtemp()
    got = {
        r["user_id"]: r["n_events"]
        for r in stateful_user_counts(spark, staged, ckpt).collect()
    }
    expected = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected


def test_stateful_cci_stream_equals_batch(spark):
    """T6 as true streaming: the stateful rolling-CCI operator over 3
    date-ordered micro-batches must equal the batch CCI computation row for
    row (state carries the 19-row lookback across batch boundaries)."""
    from ccirecommenderdatapipeline_spark.plans.cci import cci_view
    from ccirecommenderdatapipeline_spark.streaming.jobs import (
        stage_price_batches,
        stateful_cci_stream,
    )

    staged = stage_price_batches(spark, SF_SMALL, n_batches=3)
    got = (
        stateful_cci_stream(spark, staged, tempfile.mkdtemp())
        .toPandas()
        .sort_values(["symbol", "date"])
    )
    exp = (
        cci_view(spark, SF_SMALL)
        .select("symbol", "date", "open_cci", "close_cci")
        .toPandas()
        .sort_values(["symbol", "date"])
    )
    assert len(got) == len(exp) > 0
    m = got.merge(exp, on=["symbol", "date"], suffixes=("", "_b"))
    assert len(m) == len(exp)
    for c in ["open_cci", "close_cci"]:
        both_null = m[c].isna() & m[f"{c}_b"].isna()
        diff = (m[c] - m[f"{c}_b"]).abs() < 1e-9
        assert (both_null | diff).all(), c


def test_tws_user_stats_matches_batch(spark):
    """transformWithStateInPandas running per-user stats == batch GROUP BY.

    Runs everywhere since r11: ensure_protobuf() (called inside the
    registered query) prefers a native google.protobuf and otherwise
    ships the vendored pure-Python wire shim to driver and workers —
    the last pytest skip in the suite is gone."""
    from ccirecommenderdatapipeline_spark.streaming.jobs import (
        stream_tws_user_stats,
    )
    from ccirecommenderdatapipeline_spark.streaming.protobuf_compat import (
        ensure_protobuf,
    )

    ensure_protobuf(spark)
    from ccirecommenderdatapipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = stream_tws_user_stats(spark, SF_SMALL)
    want = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("max_ts_us"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_session_append_equals_batch_builtin(spark):
    """APPEND-mode streaming session windows must emit exactly the batch
    session_window result — every session once, none retained, sentinel
    excluded."""
    from ccirecommenderdatapipeline_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    stream = {
        (r["user_id"], r["w_start_us"]): r
        for r in QUERIES["stream_session_agg"](spark, sf).collect()
    }
    batch = {
        (r["user_id"], r["w_start_us"]): r
        for r in QUERIES["session_window_builtin"](spark, sf).collect()
    }
    assert stream.keys() == batch.keys()
    for k, b in batch.items():
        s = stream[k]
        assert (s["w_end_us"], s["n_events"], s["sum_value"]) == (
            b["w_end_us"], b["n_events"], b["sum_value"]
        )
    assert all(uid >= 0 for uid, _ in stream)


def test_staging_rejects_reserved_sentinel_key(spark):
    """The sentinel strip is safe only because SENTINEL_USER is reserved:
    staging must refuse a source that already carries it (r6 ADVICE —
    previously the sentinel was -1 and a legitimate -1 user would have
    been silently dropped)."""
    import pytest

    from ccirecommenderdatapipeline_spark.streaming.jobs import (
        SENTINEL_USER,
        _assert_sentinel_free,
    )

    ev = load_table(spark, SF_SMALL, "events")
    _assert_sentinel_free(ev)  # real data is clean
    # a LEGITIMATE negative id must NOT trip the guard (only the reserved key)
    _assert_sentinel_free(
        ev.limit(3).withColumn("user_id", F.lit(-1).cast("long"))
    )
    poisoned = ev.limit(1).withColumn(
        "user_id", F.lit(SENTINEL_USER).cast("long")
    )
    with pytest.raises(ValueError, match="reserved sentinel"):
        _assert_sentinel_free(ev.unionByName(poisoned))


def test_file_min_ts_key_orders_empty_files_first(spark, tmp_path):
    """repartitionByRange can emit an EMPTY partition; its staged file has
    min(ts)=NULL and must sort (first), not crash the None<Timestamp
    comparison inside the delivery-order ranking (r6 ADVICE)."""
    from ccirecommenderdatapipeline_spark.streaming.jobs import _file_min_ts_key

    ev = load_table(spark, SF_SMALL, "events").select("ts")
    full = os.path.join(tmp_path, "full")
    empty = os.path.join(tmp_path, "empty")
    ev.limit(5).coalesce(1).write.parquet(full)
    ev.limit(0).coalesce(1).write.parquet(empty)
    f_full = glob.glob(os.path.join(full, "part-*.parquet"))[0]
    f_empty = glob.glob(os.path.join(empty, "part-*.parquet"))[0]
    ranked = sorted([f_full, f_empty], key=lambda f: _file_min_ts_key(spark, f))
    assert ranked == [f_empty, f_full]


def test_stream_outer_join_equals_batch_left_join(spark):
    from ccirecommenderdatapipeline_spark import plans
    from ccirecommenderdatapipeline_spark.streaming.jobs import (
        outer_attribution_join_plan,
    )
    from ccirecommenderdatapipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    got = plans.QUERIES["stream_outer_join"](spark, SF_SMALL)
    ev = load_table(spark, SF_SMALL, "events")
    want = outer_attribution_join_plan(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the semantic the inner join never exercises: null-extended rows exist
    assert got.filter(F.col("click_id").isNull()).count() > 0
