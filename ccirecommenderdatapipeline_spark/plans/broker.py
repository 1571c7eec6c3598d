"""Queries over the custom Python DataSource connector (sources/broker.py).

The oracle regenerates the connector's deterministic arithmetic with
``generate_series`` — proving the custom-source read path (partition
planning, Arrow batching, schema projection) produces exactly the declared
contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.broker import register
from .registry import query

N_SYMBOLS = 500
N_ACCOUNTS = 3


@query(
    "broker_balances",
    oracle=f"""
WITH keys AS (
    SELECT s.suppkey, a.account_id
    FROM (SELECT unnest(range(1, {N_SYMBOLS} + 1)) AS suppkey) s
    CROSS JOIN (SELECT unnest(range(1, {N_ACCOUNTS} + 1)) AS account_id) a
), rows_ AS (
    SELECT CAST(account_id AS INTEGER)                     AS account_id,
           CAST(suppkey AS VARCHAR)                        AS symbol,
           CAST((suppkey * 7 + account_id * 13) % 100 AS BIGINT) AS hold_qty,
           ((suppkey * 131 + account_id * 17) % 9000) / 100.0 + 10.0 AS avg_buy_price,
           ((suppkey * 197 + account_id * 29) % 9000) / 100.0 + 10.0 AS current_price
    FROM keys
)
SELECT account_id, symbol, hold_qty, avg_buy_price, current_price,
       hold_qty * current_price AS eval_amount
FROM rows_
""",
)
def q_broker_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 balance scan through the custom DataSource: the reference's
    per-account REST fetch (hankook_api.py:283-334) as a partitioned
    connector read — the full table, verified cell-exact by the oracle."""
    register(spark)
    return (
        spark.read.format("broker_balances")
        .option("n_symbols", N_SYMBOLS)
        .option("n_accounts", N_ACCOUNTS)
        .load()
    )


@query(
    "broker_position_pnl",
    oracle=f"""
WITH keys AS (
    SELECT s.suppkey, a.account_id
    FROM (SELECT unnest(range(1, {N_SYMBOLS} + 1)) AS suppkey) s
    CROSS JOIN (SELECT unnest(range(1, {N_ACCOUNTS} + 1)) AS account_id) a
), rows_ AS (
    SELECT CAST(account_id AS INTEGER)                     AS account_id,
           CAST((suppkey * 7 + account_id * 13) % 100 AS BIGINT) AS hold_qty,
           ((suppkey * 131 + account_id * 17) % 9000) / 100.0 + 10.0 AS avg_buy_price,
           ((suppkey * 197 + account_id * 29) % 9000) / 100.0 + 10.0 AS current_price
    FROM keys
    WHERE (suppkey * 7 + account_id * 13) % 100 > 0
)
SELECT account_id,
       CAST(COUNT(*) AS BIGINT)                            AS n_positions,
       CAST(SUM(hold_qty) AS BIGINT)                       AS total_qty,
       CAST(SUM(CASE WHEN current_price > avg_buy_price THEN 1 ELSE 0 END) AS BIGINT) AS n_winning
FROM rows_
GROUP BY 1
""",
)
def q_broker_position_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 summary (the reference's balance summary dict -> df.agg): held
    positions per account with win counts — predicate + aggregate pushed
    over the connector scan (column pruning reaches the Python reader via
    the Arrow schema projection)."""
    register(spark)
    bal = (
        spark.read.format("broker_balances")
        .option("n_symbols", N_SYMBOLS)
        .option("n_accounts", N_ACCOUNTS)
        .load()
    )
    return (
        bal.filter(F.col("hold_qty") > 0)
        .groupBy("account_id")
        .agg(
            F.count("*").alias("n_positions"),
            F.sum("hold_qty").alias("total_qty"),
            F.sum((F.col("current_price") > F.col("avg_buy_price")).cast("long")).alias("n_winning"),
        )
    )


TOTAL_EXECS = 1000


@query(
    "stream_execution_feed",
    oracle=f"""
WITH ids AS (SELECT unnest(range(0, {TOTAL_EXECS})) AS i)
SELECT CAST(i AS BIGINT)                      AS exec_id,
       CAST(1000 + (i * 37) % 500 AS BIGINT)  AS order_no,
       CAST(1 + (i * 11) % 20 AS BIGINT)      AS exec_qty,
       ((i * 251) % 9000) / 100.0 + 10.0      AS exec_price
FROM ids
""",
)
def q_stream_execution_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 as a REAL custom streaming source: the execution-report feed read
    through offset-tracked micro-batches (373 records per page). Each
    trigger(availableNow) run consumes the reader's next prefetched page,
    so the feed is drained by REPEATED runs over ONE checkpoint — exactly
    the reference's cron-scheduled incremental model (T1/T2, app.py:98-109)
    — and committed offsets guarantee each record is delivered exactly once
    across runs (373·2 + 254 = three incremental runs: first, middle, and
    short final page). The accumulated stream must be cell-exact against
    the oracle.

    Scale shape: each micro-batch is APPENDED to a parquet staging table by
    the executors (the exactly-once sink discipline — S8); the returned
    DataFrame is a scan of that table. No row ever crosses the driver —
    drain detection reads only the run's numInputRows progress metric: a
    run that delivers fewer rows than a full page means the reader hit the
    end of the feed (the standard REST-pagination short-page signal,
    hankook_api.py:336-395's CTX_AREA loop), so no extra empty-run probe
    is paid; records arriving later are picked up by the next cron run,
    which is the reference's incremental model anyway. Each query startup
    is a fixed ~1.4 s cost, so run count — not row count — dominates at
    fixture scale; at production scale the page size is the API's, and
    the same short-page predicate terminates the drain loop."""
    import tempfile

    from ..sources.execution_feed import register as register_feed

    register_feed(spark)
    checkpoint = tempfile.mkdtemp(prefix="exec_feed_ckpt_")
    staging = tempfile.mkdtemp(prefix="exec_feed_stage_")
    page = 373

    def stage(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(staging)

    while True:
        q = (
            spark.readStream.format("execution_feed")
            .option("total", TOTAL_EXECS)
            .option("batch", page)
            .load()
            .writeStream.foreachBatch(stage)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination()
        if sum(p["numInputRows"] for p in q.recentProgress) < page:
            break
    return spark.read.schema(
        "exec_id BIGINT, order_no BIGINT, exec_qty BIGINT, exec_price DOUBLE"
    ).parquet(staging)


@query(
    "order_ledger_roundtrip",
    oracle=f"""
WITH keys AS (
    SELECT s.suppkey, a.account_id
    FROM (SELECT unnest(range(1, {N_SYMBOLS} + 1)) AS suppkey) s
    CROSS JOIN (SELECT unnest(range(1, {N_ACCOUNTS} + 1)) AS account_id) a
), rows_ AS (
    SELECT CAST(account_id AS INTEGER)                     AS account_id,
           CAST(suppkey AS VARCHAR)                        AS symbol,
           CAST((suppkey * 7 + account_id * 13) % 100 AS BIGINT) AS hold_qty,
           ((suppkey * 131 + account_id * 17) % 9000) / 100.0 + 10.0 AS avg_buy_price,
           ((suppkey * 197 + account_id * 29) % 9000) / 100.0 + 10.0 AS current_price
    FROM keys
)
SELECT account_id, symbol,
       CASE WHEN current_price > avg_buy_price THEN 'SELL' ELSE 'HOLD' END AS side,
       hold_qty                                   AS order_qty,
       current_price                              AS limit_price
FROM rows_
WHERE hold_qty > 0
""",
)
def q_order_ledger_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 order sink through a CUSTOM Python DataSource WRITER: held
    positions become order rows, each executor partition lands as one
    task-committed JSONL file, and the driver-side commit writes the
    manifest that gates visibility (two-phase commit — retried tasks never
    leak). The query returns the MANIFEST-GATED read-back, which must be
    cell-exact against the oracle's recomputation of the same orders —
    proving the write path (partitioned write + commit protocol + codec)
    loses and invents nothing. Doubles survive the JSON hop exactly
    (shortest-repr round-trip)."""
    import tempfile

    from ..sources.ledger import read_ledger, register as register_sink

    register(spark)
    register_sink(spark)
    bal = (
        spark.read.format("broker_balances")
        .option("n_symbols", N_SYMBOLS)
        .option("n_accounts", N_ACCOUNTS)
        .load()
    )
    orders = bal.filter(F.col("hold_qty") > 0).select(
        "account_id",
        "symbol",
        F.when(F.col("current_price") > F.col("avg_buy_price"), "SELL")
        .otherwise("HOLD")
        .alias("side"),
        F.col("hold_qty").alias("order_qty"),
        F.col("current_price").alias("limit_price"),
    )
    path = tempfile.mkdtemp(prefix="order_ledger_")
    orders.write.format("order_ledger").option("path", path).mode("append").save()
    return read_ledger(
        spark,
        path,
        "account_id INT, symbol STRING, side STRING, order_qty BIGINT, "
        "limit_price DOUBLE",
    )
