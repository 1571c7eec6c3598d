"""Relational operator coverage (SURVEY.md section 2.2-2.8) over the testdata
star schema. Each query maps to specific reference operators (cited per
docstring) and carries a DuckDB oracle.

Numeric determinism rules (see sources/prices.py): SUMs of decimal-exact money
are rounded at their exact decimal scale; ratios/averages are expressed as
per-row divisions of identical-bit aggregates (never engine AVG over money);
integer outputs are cast to BIGINT on both sides (DuckDB SUM(int) would
otherwise widen to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# Projections / filters / scalar expressions (P-ops, F-ops)
# --------------------------------------------------------------------------

@query(
    "proj_rename",
    oracle="""
SELECT p_partkey AS part_id,
       p_name    AS part_name,
       p_brand   AS brand,
       ROUND(p_retailprice * 1350.0, 2) AS retail_krw
FROM part
""",
)
def q_proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: vendor-name rename + column-subset projection
    (daily_function.py:415-420, :265). Catalyst prunes unread columns down to
    the parquet scan."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        F.round(F.col("p_retailprice") * 1350.0, 2).alias("retail_krw"),
    )


@query(
    "filter_conjunctive",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
  AND l_quantity > 30 AND l_discount >= 0.02 AND l_discount <= 0.08
""",
)
def q_filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4/P7/P9: zero/positive filters, date-between, 3-predicate AND
    (daily_function.py:143, :467, :263, :1324-1329). All predicates reach the
    parquet scan as pushed filters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("ship_date", F.to_date("l_shipdate"))
        .filter(
            F.col("ship_date").between(F.lit("1996-01-01"), F.lit("1997-12-31"))
            & (F.col("l_quantity") > 30)
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "ship_date")
    )


@query(
    "when_otherwise",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 'final'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'partial' END AS status_class,
       CAST(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS BIGINT) AS big_dummy
FROM orders
""",
)
def q_when_otherwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: np.where conditional assignment -> F.when chains
    (daily_function.py:255-256, 1033-1037)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_class"),
        F.when(F.col("o_totalprice") > 150000.0, 1).otherwise(0).cast("long").alias("big_dummy"),
    )


@query(
    "coalesce_bfill",
    oracle="""
SELECT l_orderkey, l_linenumber,
       COALESCE(CASE WHEN l_returnflag = 'R' THEN CAST(l_shipdate AS DATE) END,
                CASE WHEN l_linestatus = 'F' THEN CAST(l_shipdate AS DATE) + 5 END,
                CAST(l_shipdate AS DATE) + 10) AS sell_date
FROM lineitem
""",
)
def q_coalesce_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: pandas bfill(axis=1) first-non-null across columns -> F.coalesce
    (daily_function.py:1019-1027, the sell_date/sell_price coalesce)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(
            F.when(F.col("l_returnflag") == "R", d),
            F.when(F.col("l_linestatus") == "F", F.date_add(d, 5)),
            F.date_add(d, 10),
        ).alias("sell_date"),
    )


@query(
    "cast_battery",
    oracle="""
SELECT event_id,
       lpad(CAST(user_id AS VARCHAR), 6, '0')            AS symbol,
       strftime(ts, '%Y%m%d')                            AS ymd,
       CAST(strptime(strftime(ts, '%Y%m%d'), '%Y%m%d') AS DATE) AS parsed_date,
       CAST(CAST(value AS VARCHAR) AS DOUBLE)            AS value_roundtrip,
       -- Spark's double->long cast truncates toward zero; DuckDB's rounds.
       CAST(CAST(trunc(value) AS BIGINT) AS VARCHAR)     AS value_int_str
FROM events
""",
)
def q_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/F1/F9: the stringly-typed coercion layer — zero-padded symbol
    round-trips, yyyyMMdd parse/format, numeric str round-trips
    (daily_function.py:578-581, 1184-1192, 1486, 1679)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("symbol"),
        F.date_format("ts", "yyyyMMdd").alias("ymd"),
        F.to_date(F.date_format("ts", "yyyyMMdd"), "yyyyMMdd").alias("parsed_date"),
        F.col("value").cast("string").cast("double").alias("value_roundtrip"),
        F.col("value").cast("long").cast("string").alias("value_int_str"),
    )


@query(
    "date_arith",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) + 1                                        AS next_day,
       CAST(CAST(o_orderdate AS DATE) - INTERVAL 3 MONTH AS DATE)           AS minus_3m,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT) AS days_to_cutoff
FROM orders
""",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: Timedelta/DateOffset arithmetic -> date_add/add_months/datediff
    (daily_function.py:133, 680, 767, 1907)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 1).alias("next_day"),
        F.add_months(d, -3).alias("minus_3m"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).cast("long").alias("days_to_cutoff"),
    )


@query(
    "scalar_minmax",
    oracle="""
SELECT MIN(CAST(l_shipdate AS DATE)) AS min_date,
       MAX(CAST(l_shipdate AS DATE)) AS max_date,
       MIN(l_extendedprice)          AS min_price,
       MAX(l_extendedprice)          AS max_price,
       CAST(COUNT(*) AS BIGINT)      AS n_rows
FROM lineitem
""",
)
def q_scalar_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/A5: scalar min/max aggregates (the incremental-fetch watermark,
    daily_function.py:127, 441-442, 644-645)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min(F.to_date("l_shipdate")).alias("min_date"),
        F.max(F.to_date("l_shipdate")).alias("max_date"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "quantile_disc",
    oracle="""
WITH ranked AS (
    SELECT l_returnflag, l_quantity,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n
    FROM lineitem
)
SELECT l_returnflag,
       MIN(CASE WHEN rn = (3 * n + 9) // 10 THEN l_quantity END) AS q30,
       MAX(l_quantity) AS q100
FROM ranked
GROUP BY l_returnflag
""",
)
def q_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/A6: Series.quantile thresholds (daily_function.py:1316-1319) as a
    type-1 discrete quantile — rank = ceil(0.3 n) in pure integer math, so
    both engines agree exactly (interpolating quantile_cont implementations
    differ in FP association and cannot be hash-matched)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    ranked = li.select("l_returnflag", "l_quantity").withColumns({
        "rn": F.row_number().over(w),
        "n": F.count("*").over(Window.partitionBy("l_returnflag")),
    })
    return ranked.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("rn") == F.expr("(3 * n + 9) DIV 10"), F.col("l_quantity"))).alias("q30"),
        F.max("l_quantity").alias("q100"),
    )


@query(
    "regex_json_extract",
    oracle="""
SELECT event_id,
       regexp_extract(props, '[0-9]+', 0)              AS k_str,
       CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_num,
       CAST(starts_with(event_type, 'p') AS BOOLEAN)   AS is_p
FROM events
""",
)
def q_regex_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8: regex extract of digits + startswith
    (daily_function.py:1161, 828). The JSON-typed variant is json_get_k."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", "[0-9]+", 0).alias("k_str"),
        F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("k_num"),
        F.col("event_type").startswith("p").alias("is_p"),
    )


@query(
    "json_get_k",
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def q_json_get_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension (SURVEY section 2.3 note): typed JSON access —
    F.get_json_object stays JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# --------------------------------------------------------------------------
# Joins (J-ops)
# --------------------------------------------------------------------------

@query(
    "lookup_join",
    oracle="""
SELECT s.s_name AS supplier_name,
       CAST(COUNT(*) AS BIGINT)        AS n_items,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
""",
)
def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: per-symbol lookup (daily_function.py:819-821, 1412) as an explicit
    broadcast hash join — the dimension is small and the hint survives
    statistics loss at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "anti_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/P6/U2: administrative-symbol exclusion (daily_function.py:234-237)
    as left_anti — broadcast-able, no shuffle of the big side at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "semi_join",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 45)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: membership test (progress filter, daily_function.py:935) as
    left_semi."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@query(
    "update_join",
    oracle="""
SELECT o.o_orderkey,
       o.o_orderstatus,
       COALESCE(e.real_qty, CAST(0 AS BIGINT))   AS real_qty,
       COALESCE(e.real_price, o.o_totalprice)    AS real_price,
       CAST(e.o_orderkey IS NOT NULL AS BOOLEAN) AS executed
FROM orders o
LEFT JOIN (
    SELECT l_orderkey AS o_orderkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS real_qty,
           ROUND(SUM(l_extendedprice), 2) AS real_price
    FROM lineitem GROUP BY l_orderkey
) e USING (o_orderkey)
""",
)
def q_update_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: key-matched update join — broker executions matched to order
    history by order number, real_* fields written via COALESCE(new, old)
    (daily_function.py:1676-1694, 1882-1920). MERGE-style without Delta."""
    o = load_table(spark, sf_dir, "orders")
    ex = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("real_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("real_price"),
        )
    )
    return o.join(ex, "o_orderkey", "left").select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce("real_qty", F.lit(0).cast("long")).alias("real_qty"),
        F.coalesce("real_price", "o_totalprice").alias("real_price"),
        ex["o_orderkey"].isNotNull().alias("executed"),
    )


@query(
    "cross_grid",
    oracle="""
WITH grid AS (
    SELECT h.holding_days, t.target_return
    FROM (VALUES (5), (20), (60)) h(holding_days)
    CROSS JOIN (VALUES (3), (5), (10)) t(target_return)
)
SELECT g.holding_days, g.target_return, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM grid g CROSS JOIN (
    SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
) n
GROUP BY g.holding_days, g.target_return, n.n_name
""",
)
def q_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: the strategy-grid cross join (daily_function.py:717-720; grid
    app.py:41-44) — a broadcast crossJoin of an exploded literal dimension.
    The full 4,860-combo grid drives the simulator (plans/simulator.py)."""
    spark_grid = (
        spark.range(1)
        .select(F.explode(F.array(*[F.lit(x) for x in (5, 20, 60)])).alias("holding_days"))
        .crossJoin(
            spark.range(1).select(
                F.explode(F.array(*[F.lit(x) for x in (3, 5, 10)])).alias("target_return")
            )
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("c_custkey", "n_name")
    return (
        F.broadcast(spark_grid)
        .crossJoin(cn)
        .groupBy("holding_days", "target_return", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "upsert_keep_last",
    oracle="""
WITH old_batch AS (
    SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_date, 0 AS src_rank
    FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1997-12-31'
), new_batch AS (
    SELECT l_orderkey, l_linenumber, l_quantity + 100 AS l_quantity, CAST(l_shipdate AS DATE) AS ship_date, 1 AS src_rank
    FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
), unioned AS (
    SELECT * FROM old_batch UNION ALL SELECT * FROM new_batch
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                 ORDER BY src_rank DESC, l_quantity, ship_date) AS rn
    FROM unioned
)
SELECT l_orderkey, l_linenumber, l_quantity, CAST(src_rank AS BIGINT) AS src_rank
FROM ranked WHERE rn = 1
""",
)
def q_upsert_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/W7/U1: incremental upsert — union of overlapping batches, newest
    source wins per key (daily_function.py:490-516, 649, 1555-1569). pandas
    keep='last' row order becomes an explicit src_rank priority column."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    old_b = (
        li.filter(d <= F.lit("1997-12-31"))
        .select("l_orderkey", "l_linenumber", "l_quantity", d.alias("ship_date"), F.lit(0).alias("src_rank"))
    )
    new_b = (
        li.filter(d >= F.lit("1997-01-01"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_quantity") + 100).alias("l_quantity"),
            d.alias("ship_date"),
            F.lit(1).alias("src_rank"),
        )
    )
    unioned = old_b.unionByName(new_b)
    # (orderkey, linenumber) is not unique in the fixture — the full ordering
    # makes the keep-last choice deterministic in any engine (SURVEY 4.4).
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("src_rank"), F.asc("l_quantity"), F.asc("ship_date")
    )
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("l_orderkey", "l_linenumber", "l_quantity", F.col("src_rank").cast("long").alias("src_rank"))
    )


@query(
    "star_join_revenue",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query (TPC-H Q5 shape): fact-to-fact shuffle join on
    orderkey, then broadcast joins up the dimension chain — the plan Catalyst
    should pick with the dims explicitly broadcast.

    Revenue sums as DECIMAL of the per-row 4dp-rounded product
    (order-free; the raw-double sum's cross-engine drift at 24k
    rows/group sat within ~3x of the 4dp rounding boundary — same risk
    class as grouped_multi_agg's r9 sf0.1 flip, fixed preemptively)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            # simulator readout idiom (operators/simulator.py:397): the
            # DECIMAL sum casts to double ONCE (correctly rounded,
            # engine-identical); re-ROUNDing the double reintroduces the
            # HALF_UP-vs-multiply knife edge past 2^53 (ADVICE r9)
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Aggregations / windows / sorts / sets (A-ops, O-ops, U-ops)
# --------------------------------------------------------------------------

@query(
    "grouped_multi_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT)                       AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)     AS n_orders,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_deep_disc,
       100.0 * SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) / COUNT(*) AS deep_disc_rate,
       SUM(CAST(l_quantity AS BIGINT)) / COUNT(*)     AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_grouped_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A4: the per-strategy grouped multi-agg + derived rate measures
    (daily_function.py:1047-1071). Averages and rates are per-row divisions
    of exact integer/decimal aggregates — partial (map-side) aggregation is
    native; no engine AVG over money.

    Money sums run as DECIMAL (2dp cast for base price; per-row
    ROUND(...,4) for the discounted product, which is exactly 4dp as a
    rational) so they are partial-aggregation-order-free: the raw-double
    form drifted ~1e-4 between engines over the 2.5M-row groups at
    sf0.1 — past sum_disc's 4dp rounding boundary — and flipped 3 of 6
    groups (caught by the r9 sf0.1 oracle sweep; sf0.01 passed on
    luck). Same idiom as tpch_q10's revenue (tpch.py:495)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agged = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        # one decimal->double cast, no re-ROUND of the double: see
        # star_join_revenue's readout comment (ADVICE r9)
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").alias("sum_base"),
        F.sum(F.round(disc_price, 4).cast("decimal(18,4)"))
        .cast("double").alias("sum_disc"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_deep_disc"),
    )
    return agged.withColumns({
        "deep_disc_rate": F.lit(100.0) * F.col("n_deep_disc") / F.col("n_rows"),
        "avg_qty": F.col("sum_qty") / F.col("n_rows"),
    })


@query(
    "top1_per_group",
    oracle="""
WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, order_date
FROM ranked WHERE rn = 1
""",
)
def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/O3: argmax row per group (idxmax, daily_function.py:1078-1080) with
    an explicit deterministic tie-break (orderkey asc) replacing pandas'
    positional first-occurrence."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.to_date("o_orderdate").alias("order_date"))
    )


@query(
    "sort_limit",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 100
""",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: multi-key sort + head-N cap (daily_function.py:1383, 920-921)
    with a deterministic ordering (reference relies on listing order). Spark
    executes this as TakeOrderedAndProject — no global sort materialized."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(100)
    )


@query(
    "union_dedup",
    oracle="""
SELECT DISTINCT brand FROM (
    SELECT p_brand AS brand FROM part WHERE p_size > 20
    UNION ALL
    SELECT p_brand AS brand FROM part WHERE p_retailprice > 1500.0
)
""",
)
def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/W8/A3: schema-aligned union + full-row dedup
    (daily_function.py:260, 153, 710)."""
    p = load_table(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") > 20).select(F.col("p_brand").alias("brand"))
    b = p.filter(F.col("p_retailprice") > 1500.0).select(F.col("p_brand").alias("brand"))
    return a.unionByName(b).dropDuplicates()


@query(
    "rollup_counts",
    oracle="""
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension (SURVEY section 2.5 note): rollup/cube come free with
    Spark — subtotal + grand-total rows with NULL group markers."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "window_lag_running",
    oracle="""
SELECT event_id, user_id, ts, event_type,
       LAG(value) OVER w                         AS prev_value,
       LEAD(event_type) OVER w                   AS next_type,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       CAST(ROW_NUMBER() OVER w AS BIGINT)       AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_window_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/W5 generalization: lag/lead/running-sum per user over event time.
    The running SUM of 2-decimal money has a 2-decimal-exact true value, so
    round-at-2 is engine-independent."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_value"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


@query(
    "cube_grouping_battery",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_grouping_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension (SURVEY §2.5 note, the CUBE sibling of
    ``rollup_counts``): all four grouping-set combinations in one pass,
    with ``grouping_id()`` distinguishing a real NULL group value from a
    subtotal marker — the bitmask Spark and the SQL-standard
    GROUPING(a, b) agree on. Money sums go through the decimal-exact
    route per the repo contract. One expand + hash agg: Spark's Expand
    emits the 4 grouping-set rows per input row map-side and the
    aggregate stays map-combinable — no extra shuffle vs a plain
    group-by at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round("l_extendedprice", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty", "sum_price"
        )
    )
