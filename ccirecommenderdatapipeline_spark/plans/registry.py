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
# name -> WHY this op has no SQL oracle (the explicit skip list, VERDICT
# r8 item 4): every oracle=None registration MUST document its reason
# here via the decorator, and tests/test_pipeline.py pins that (a) this
# list never grows silently and (b) the 50-name driver window contains
# only oracle-bearing names, so a rows-only op can never surface as an
# ``err: no_oracle`` row in a CORRECTNESS window again.
ROWS_ONLY_REASONS: dict[str, str] = {}


def query(
    name: str,
    oracle: str | None = None,
    rows_only_reason: str | None = None,
    late_oracle: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check) and
    REQUIRES ``rows_only_reason`` — a one-line justification recorded in
    ``ROWS_ONLY_REASONS``. ``late_oracle=True`` declares the oracle is
    attached right after definition by mutating ``ORACLES`` (composite
    queries whose SQL embeds another query's oracle); the registry
    contract test verifies the attachment actually happened."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        if oracle is None and not rows_only_reason and not late_oracle:
            raise ValueError(
                f"query {name!r} has no oracle and no rows_only_reason — "
                "document why it is not SQL-expressible or add an oracle"
            )
        if oracle is not None and rows_only_reason:
            raise ValueError(
                f"query {name!r} has BOTH an oracle and a rows_only_reason"
            )
        if late_oracle and (oracle is not None or rows_only_reason):
            # late_oracle used to bypass both guards above: combined with
            # rows_only_reason it recorded the query rows-only AND later
            # attached an oracle — the contradictory state the BOTH-check
            # exists to prevent
            raise ValueError(
                f"query {name!r}: late_oracle means the oracle is attached "
                "after definition — it cannot be combined with an inline "
                "oracle or a rows_only_reason"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        elif rows_only_reason:
            ROWS_ONLY_REASONS[name] = rows_only_reason
        return fn

    return deco
