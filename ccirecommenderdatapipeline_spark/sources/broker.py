"""Custom Python DataSource (pyspark.sql.datasource, Spark 4): the engine's
mapping for the reference's REST broker scans (SURVEY S3/S6/S7 —
hankook_api.py:283-334 balance scan, :336-395 execution scan). A live
connector would page the HTTP API per partition with rate limiting
(hankook_api.py:105); this fixture source generates the same SHAPE
deterministically from pure arithmetic on the account/symbol key so the
driver's DuckDB oracle can recompute it exactly.

Connector scale notes: ``partitions()`` splits the key range so reads
parallelize across executors like any scan; each partition is independent
(no driver-side fetch loop — the reference's per-symbol REST loop, SURVEY
OP8, becomes partition parallelism).

Packaging note: ALL classes are built inside ``make_source()`` — Spark
pickles the DataSource/Reader to executor Python workers, and classes
defined at module level in this package would be pickled by module
reference, which workers cannot import when the driver runs from a foreign
cwd (the driver-contract shape). Function-scoped classes pickle by value.
"""

from __future__ import annotations

BROKER_SCHEMA_DDL = (
    "account_id INT, symbol STRING, hold_qty BIGINT, avg_buy_price DOUBLE, "
    "current_price DOUBLE, eval_amount DOUBLE"
)

N_PARTITIONS = 8


def make_source():
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    from pyspark.sql.types import StructType

    schema_ddl = BROKER_SCHEMA_DDL
    n_parts = N_PARTITIONS

    class _Range(InputPartition):
        def __init__(self, start: int, end: int, accounts: int):
            self.start, self.end, self.accounts = start, end, accounts

    class _TokenBucket:
        """Per-partition token bucket (SURVEY OP9 / hankook_api.py:105's
        20 req/s limiter): continuous refill, sleeps the reader when
        empty. One token = one simulated REST request (one symbol page).
        On a cluster each partition throttles independently, exactly like
        the reference's per-process limiter — size ``max_rps`` x
        partition count to the API's global budget (the connector knob a
        real deployment tunes alongside n_partitions)."""

        def __init__(self, rate: float, burst: float):
            import time

            self._time = time.monotonic
            self._sleep = time.sleep
            self.rate = float(rate)
            self.capacity = max(1.0, float(burst))
            self.tokens = self.capacity
            self.t = self._time()

        def acquire(self, n: float = 1.0) -> None:
            while True:
                now = self._time()
                self.tokens = min(
                    self.capacity, self.tokens + (now - self.t) * self.rate
                )
                self.t = now
                if self.tokens >= n:
                    self.tokens -= n
                    return
                self._sleep(min(0.05, (n - self.tokens) / self.rate))

    class BrokerBalancesReader(DataSourceReader):
        def __init__(self, options):
            self.n_symbols = int(options.get("n_symbols", 100))
            self.n_accounts = int(options.get("n_accounts", 2))
            # 0 = unthrottled (fixture default); a live deployment sets
            # the API budget here, e.g. .option("max_rps", 20)
            self.max_rps = float(options.get("max_rps", 0))
            self.burst = float(options.get("burst", self.max_rps))

        def partitions(self):
            step = max(1, self.n_symbols // n_parts)
            return [
                _Range(s, min(s + step, self.n_symbols + 1), self.n_accounts)
                for s in range(1, self.n_symbols + 1, step)
            ]

        def read(self, partition):
            # deterministic balance records; formulas mirrored verbatim in
            # the DuckDB oracle (plans/broker.py)
            bucket = (
                _TokenBucket(self.max_rps, self.burst)
                if self.max_rps > 0
                else None
            )
            for suppkey in range(partition.start, partition.end):
                if bucket is not None:
                    bucket.acquire()  # one request per symbol page
                for account_id in range(1, partition.accounts + 1):
                    hold_qty = (suppkey * 7 + account_id * 13) % 100
                    avg_buy = ((suppkey * 131 + account_id * 17) % 9000) / 100.0 + 10.0
                    cur = ((suppkey * 197 + account_id * 29) % 9000) / 100.0 + 10.0
                    yield (
                        account_id, str(suppkey), hold_qty, avg_buy, cur,
                        hold_qty * cur,
                    )

    class BrokerBalancesSource(DataSource):
        """spark.read.format("broker_balances").option("n_symbols", N).load()"""

        @classmethod
        def name(cls) -> str:
            return "broker_balances"

        def schema(self) -> str:
            return schema_ddl

        def reader(self, schema: StructType) -> DataSourceReader:
            return BrokerBalancesReader(self.options)

    return BrokerBalancesSource


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(make_source())
