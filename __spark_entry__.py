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

    The reference's E1 end-to-end: prices (S1/P1) -> CCI windows (W1-W3) ->
    crossover signals (W4) -> full 4,860-combo strategy simulation (W6/J6)
    -> per-(symbol, condition) aggregation (A1/A2) -> best strategy per
    symbol (A7). One row per symbol with at least one trade, always >0.
    """
    return plans.QUERIES["best_return_full_grid"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
