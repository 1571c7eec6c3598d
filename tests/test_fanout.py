"""Contracts for the r13 fan-out/laziness replans.

Two behaviors the round-13 performance work depends on, pinned so a
refactor can't silently undo them:

1. ``sources/tables.fan_out`` must yield EXACTLY defaultParallelism
   partitions — the whole point is that AQE coalesces an un-sized
   ``repartition(col)`` on a tiny input back to ONE partition, which
   re-serializes the generator stage it exists to parallelize (PLANS.md
   "fan_out before the document signature passes").
2. ``markov_stationary``'s plan construction must trigger ZERO Spark
   jobs — the r12 shape ran 20+ eager localCheckpoint jobs at build
   time (the eager-at-construction wart VERDICT r12 flagged for the
   MLlib wrappers); the r13 one-row nested-HOF fold is lazy end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccirecommenderdatapipeline_spark import plans
from ccirecommenderdatapipeline_spark.sources.tables import fan_out, load_table
from tests.conftest import SF_SMALL


def test_fan_out_defeats_aqe_coalescing(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    assert docs.rdd.getNumPartitions() == 1, (
        "fixture premise changed: documents is no longer a single split "
        "— re-check whether fan_out call sites are still needed"
    )
    fanned = fan_out(docs, "doc_id")
    want = spark.sparkContext.defaultParallelism
    got = fanned.rdd.getNumPartitions()
    assert got == want, (
        f"fan_out produced {got} partitions, want defaultParallelism="
        f"{want} — an un-sized repartition(col) here would be AQE-"
        "coalesced back to 1 and the generator stage it feeds would run "
        "single-core"
    )
    # same rows, key-complete — the shuffle must be a pure repartition
    assert fanned.count() == docs.count()
    # getNumPartitions() above reflects the STATIC shuffle partitioning;
    # AQE's coalesce decision only shows in the EXECUTED plan (ADVICE
    # r13 item 4). Run a real action and count the partitions rows were
    # actually in: a regression to an un-sized repartition(col) gets
    # AQE-coalesced back to ONE executed partition on this tiny input.
    executed = (
        fanned.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert executed > 1, (
        f"fan_out executed in {executed} partition(s) — AQE coalesced "
        "the fan-out shuffle, so the generator stage it feeds runs "
        "single-core despite the static partitioning looking right"
    )


def test_markov_stationary_constructs_lazily(spark):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # first build warms the parquet file-listing metadata (a cold
    # session runs one harmless listing job per table — those are not
    # the eager-execution class this test pins)
    plans.QUERIES["markov_stationary"](spark, SF_SMALL)
    # the SECOND build must trigger nothing: job ids are counted inside
    # a dedicated job group so concurrent fixtures can't leak into it
    sc.setJobGroup("markov-construct", "laziness contract")
    try:
        df = plans.QUERIES["markov_stationary"](spark, SF_SMALL)
        new_jobs = set(tracker.getJobIdsForGroup("markov-construct") or [])
    finally:
        sc.setJobGroup("", "")
    # spark.read.parquet runs a one-task footer/schema job per table on
    # EVERY build (3 tables here) — inherent to schema-less reads, not
    # eager execution. The signature of the r12 eager shape was 22 jobs
    # with real multi-task stages, so pin on TASK volume: metadata jobs
    # are 1 task each.
    total_tasks = 0
    for jid in new_jobs:
        info = tracker.getJobInfo(jid)
        for sid in info.stageIds if info else []:
            sinfo = tracker.getStageInfo(sid)
            total_tasks += sinfo.numTasks if sinfo else 0
    assert total_tasks <= 3, (
        f"building markov_stationary ran {total_tasks} tasks across "
        f"jobs {sorted(new_jobs)} — more than the 3 one-task schema "
        "reads, so the r13 lazy one-row fold regressed to "
        "eager-at-construction"
    )
    # and the returned plan still carries real structure (scan + aggs),
    # i.e. it is not an eager local-relation readout
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan or "FileScan" in plan
    # the fold itself: one aggregate over sequence(1, MARKOV_ITERS)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "sequence(1, 20" in analyzed, (
        "the 20-iteration HOF fold is gone from the plan — if the "
        "iteration count changed, update this pin alongside MARKOV_ITERS"
    )


def test_markov_stationary_values(spark):
    rows = {
        r["brand"]: r["pi"]
        for r in plans.QUERIES["markov_stationary"](spark, SF_SMALL).collect()
    }
    # a probability vector over the reachable brand states
    assert rows and abs(sum(rows.values()) - 1.0) < 1e-6
    assert all(0.0 <= v <= 1.0 for v in rows.values())
