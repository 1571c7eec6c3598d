"""SparkSession construction, tuned for the scale envelope.

The reference parallelizes per-symbol with ProcessPoolExecutor(cpu_count-1)
(/root/reference/daily_function.py:974-975); here parallelism is native
partition parallelism, so the only knobs that matter are shuffle sizing and
adaptive execution. Settings chosen for local[32] testing but written so the
same code runs on a 1000-executor cluster:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting means
  the static ``spark.sql.shuffle.partitions`` is a ceiling, not a fixed cost.
- Arrow on: every Pandas-UDF boundary (MAD fallback, multimodal decode) moves
  columnar batches, not pickled rows.
- broadcast threshold left at default 10 MB; dimension tables (conditions
  grid, symbol list, holiday calendar) are broadcast explicitly at call sites
  so intent survives statistics loss at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "ccirecommenderdatapipeline-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Master resolution: $SPARK_GRAFT_MASTER wins (so `--master yarn`
    deployments export it and the builder does not silently pin the job
    to the driver node with a hardcoded local[]), else local[$CPUS].
    NB getOrCreate(): if a session already exists in this process, its
    conf wins and this call's app_name/shuffle_partitions are ignored —
    Spark semantics, relied on by the shared-session test fixture."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    sp = (
        DEFAULT_SHUFFLE_PARTITIONS
        if shuffle_partitions is None
        else shuffle_partitions
    )
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
