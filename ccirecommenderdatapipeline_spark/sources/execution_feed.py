"""Custom STREAMING Python data source (Spark 4 SimpleDataSourceStreamReader):
the broker execution-report feed (SURVEY S6, hankook_api.py:336-395) as a
real offset-tracked stream — each micro-batch delivers the next chunk of
execution reports; offsets checkpoint/replay exactly (readBetweenOffsets),
giving the reconciliation pipeline exactly-once input.

Deterministic fixture arithmetic (mirrored in the DuckDB oracle) instead of
HTTP paging; classes are function-scoped for foreign-cwd executor pickling
(see sources/broker.py packaging note).
"""

from __future__ import annotations

EXEC_SCHEMA_DDL = (
    "exec_id BIGINT, order_no BIGINT, exec_qty BIGINT, exec_price DOUBLE"
)


def make_stream_source():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import StructType

    schema_ddl = EXEC_SCHEMA_DDL

    def gen_rows(start: int, end: int):
        # a picklable list_iterator, NOT a generator: the simple-reader
        # wrapper pickles prefetched rows into the offset log for replay
        return iter([
            (
                i,
                1000 + (i * 37) % 500,
                1 + (i * 11) % 20,
                ((i * 251) % 9000) / 100.0 + 10.0,
            )
            for i in range(start, end)
        ])

    class ExecutionFeedReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.total = int(options.get("total", 1000))
            self.batch = int(options.get("batch", 137))

        def initialOffset(self) -> dict:
            return {"next_id": 0}

        def read(self, start: dict):
            lo = start["next_id"]
            hi = min(lo + self.batch, self.total)
            return gen_rows(lo, hi), {"next_id": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return gen_rows(start["next_id"], end["next_id"])

    class ExecutionFeedSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "execution_feed"

        def schema(self) -> str:
            return schema_ddl

        def simpleStreamReader(self, schema: StructType):
            return ExecutionFeedReader(self.options)

    return ExecutionFeedSource


def register(spark) -> None:
    spark.dataSource.register(make_stream_source())
