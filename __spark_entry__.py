"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (prices -> rolling CCI -> crossover
signal summary) at sf0.001; ``queries()``/``oracle_sql()`` expose the full
registry from ``ccirecommenderdatapipeline_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ccirecommenderdatapipeline_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-symbol signal summary: prices (S1/P1) -> CCI windows (W1-W3) ->
    crossover (W4) -> grouped counts (A3/A4). One row per symbol, always >0.
    """
    return plans.QUERIES["signal_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
