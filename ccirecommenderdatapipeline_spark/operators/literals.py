"""Cache-stable literal tables.

``spark.createDataFrame(rows)`` in PySpark produces an RDD-backed logical
relation whose canonicalized plan embeds the RDD identity, so two calls with
IDENTICAL data are never ``sameResult``. Any query plan that embeds such a
literal (a strategy grid, a depth table, a holiday calendar) therefore
defeats CacheManager plan-matching: a ``.persist()``-ed shared subtree built
in one query invocation is invisible to the next invocation's identical
plan, and the whole subtree silently recomputes (measured: the shared
sim->aggregate cache was rebuilt per best_* query, ~5-13 s each at sf0.1).

``literal_table`` builds the same rows as pure Catalyst expressions —
``range(1).select(inline(array(struct(...))))`` — which canonicalize by
VALUE, so identical reconstructions are ``sameResult`` and in-memory cache
lookups hit. Literal volume is bounded (grids/calendars, <10k cells); at
100 TB these tables are broadcast either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def literal_table(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """``createDataFrame(rows, ddl_schema)`` replacement whose plan is
    cache-stable (see module docstring). ``schema`` is a DDL string; values
    are rendered with ``F.lit`` + explicit cast, so None maps to a typed
    NULL exactly as createDataFrame would."""
    struct = StructType.fromDDL(schema)
    fields = [(f.name, f.dataType) for f in struct.fields]
    structs = [
        F.struct(
            *[
                F.lit(v).cast(dt).alias(name)
                for v, (name, dt) in zip(row, fields)
            ]
        )
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
