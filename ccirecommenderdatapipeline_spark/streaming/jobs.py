"""Structured Streaming jobs over the ``events`` table (SURVEY.md §2.9
T1-T6: the reference approximates streaming with cron-scheduled incremental
batch, daily_function.py:127-133, 466-516; app.py:98-109 — here the same
semantics run as real streams with watermarks + checkpoints).

Event-time columns are emitted as epoch MICROSECONDS (bigint): the testdata
parquet is TIMESTAMP(NANOS), which both Spark (via nanosAsLong, see
sources/tables.py) and DuckDB truncate to micros — epoch integers compare
exactly across engines and time zones.

Money-free double sums use the DECIMAL(18,6) trick: ``value`` rounded to its
6-decimal scale and summed exactly (order-independent), then emitted as
double — grouped double sums are the one FP op whose result depends on
partial-aggregation order, so they never appear raw in any oracle-checked
result.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

GAP_US = 1_800_000_000          # 30-minute session gap
HOUR_US = 3_600_000_000

STAGE_ROOT = "/tmp/spark_graft_streaming"


def exact_value_sum(col: str = "value") -> F.Column:
    """Order-independent sum of a double column (see module docstring)."""
    return F.sum(F.round(F.col(col), 6).cast("decimal(18,6)")).cast("double")


def stage_events_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Materialize events (ts converted to micros) as an n-file parquet
    directory for file-source streaming. Idempotent per sf_dir."""
    from ..sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(STAGE_ROOT, f"{tag}_events_{n_files}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "events").repartition(n_files).write.mode(
            "overwrite"
        ).parquet(out)
    return out


def events_stream(spark: SparkSession, staged_dir: str, **options) -> DataFrame:
    schema = spark.read.parquet(staged_dir).schema
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(staged_dir)


def tumbling_agg_plan(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows: works identically on a batch or stream DF."""
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w)
        .agg(
            # NB: no count_distinct here — exact distinct aggregation is
            # unsupported on streaming DataFrames, and this plan runs both ways
            F.count("*").alias("n_events"),
            exact_value_sum().alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("w_start_us"),
            F.unix_micros(F.col("window.end")).alias("w_end_us"),
            "n_events", "sum_value",
        )
    )


def run_to_memory(
    plan: DataFrame,
    output_mode: str = "complete",
    checkpoint: str | None = None,
) -> DataFrame:
    """Execute a streaming plan with trigger(availableNow) into a memory
    sink; blocks until all staged data is processed and returns the result
    table as a batch DataFrame."""
    name = f"strm_{uuid.uuid4().hex[:10]}"
    q = (
        plan.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint or os.path.join(STAGE_ROOT, "ckpt", name))
        .start()
    )
    q.awaitTermination()
    return plan.sparkSession.table(name)


def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming pipeline: file source -> event-time watermark ->
    tumbling window agg -> availableNow -> memory sink. Complete output mode
    keeps every window, so the result equals the batch computation (and its
    DuckDB oracle) exactly."""
    staged = stage_events_dir(spark, sf_dir)
    sdf = events_stream(spark, staged).withWatermark("ts", "1 hour")
    return run_to_memory(tumbling_agg_plan(sdf), "complete")


def upsert_foreach_batch(target_dir: str):
    """foreachBatch MERGE without Delta (SURVEY T3/J7): each micro-batch is
    appended with its batch id; readers resolve the latest version per key
    with a keep-max-batch window — idempotent under batch replay because the
    (key, batch_id) pair is stable."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(target_dir)
        )

    return write_batch


def read_upsert_target(spark: SparkSession, target_dir: str, key: str = "event_id") -> DataFrame:
    """Latest-version view over the upsert log (keep max __batch_id per key,
    ties broken arbitrarily-but-deterministically by full ordering)."""
    from pyspark.sql import Window

    log = spark.read.parquet(target_dir)
    w = Window.partitionBy(key).orderBy(F.desc("__batch_id"))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__batch_id")
    )


def stateful_user_counts(spark: SparkSession, staged_dir: str, checkpoint: str) -> dict[int, int]:
    """Custom stateful operator via applyInPandasWithState: a running
    per-user event count carried in GroupState across micro-batches
    (maxFilesPerTrigger=1 forces one batch per staged file). Returns the
    final count per user observed after the last batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    sdf = events_stream(spark, staged_dir, maxFilesPerTrigger=1)

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    counts = (
        sdf.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )

    final: dict[int, int] = {}

    def capture(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():
            final[row["user_id"]] = row["n_events"]

    q = (
        counts.writeStream.foreachBatch(capture)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return final
