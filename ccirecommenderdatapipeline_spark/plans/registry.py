"""Decorator-based registry binding each Spark query to its DuckDB oracle.

Contract (BASELINE.md driver gate): for every name, the Spark callable
``(spark, sf_dir) -> DataFrame`` and the oracle SQL must produce identical
row count, schema, and order-insensitive value hash at sf0.01. Column names
are aliased identically on both sides; doubles are rounded (4 decimals for
prices/indicators, 2 for rates) on both sides so floating-point
summation-order differences cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
