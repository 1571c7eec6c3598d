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
            # SURVEY OP9: one token per poll (one simulated REST page per
            # micro-batch fetch); 0 = unthrottled fixture default. The
            # simple stream reader runs driver-side, so the bucket lives
            # across read() calls — the per-process limiter shape of
            # hankook_api.py:105.
            self.max_rps = float(options.get("max_rps", 0))
            self._bucket_state: list | None = None  # [tokens, last_t]

        def initialOffset(self) -> dict:
            return {"next_id": 0}

        def _throttle(self) -> None:
            if self.max_rps <= 0:
                return
            import time

            if self._bucket_state is None:
                # burst of 1: the first poll is free, later polls pace
                self._bucket_state = [1.0, time.monotonic()]
            tokens, last = self._bucket_state
            while True:
                now = time.monotonic()
                tokens = min(1.0, tokens + (now - last) * self.max_rps)
                last = now
                if tokens >= 1.0:
                    self._bucket_state = [tokens - 1.0, last]
                    return
                time.sleep(min(0.05, (1.0 - tokens) / self.max_rps))

        def read(self, start: dict):
            self._throttle()
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
