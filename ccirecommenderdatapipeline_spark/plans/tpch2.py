"""TPC-H queries 2/7/8/9/11/13/15/17/20/21 — completing the 22-query suite
(plans/tpch.py holds the rest). Adapted to the fixture warehouse where it
lacks TPC-H columns (no partsupp table, no commit/receipt dates, no
container/mfgr): every adaptation keeps the ORIGINAL query's plan shape —
the correlated subquery, the semi/anti-join chain, the group-filter
cascade — and swaps only the missing attribute for a fixture-derivable
stand-in, documented per query.

Determinism discipline (same as plans/tpch.py): any sum that feeds a
COMPARISON (max-equality, threshold, share ratio) is accumulated as
DECIMAL over per-row ROUND(x, 4) so combine order cannot flip a verdict;
display sums round at the aggregate boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.tables import load_table
from .registry import query

Q2_REGION = "EUROPE"
Q2_TYPE = "LARGE"
Q2_SIZE_MAX = 15
Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_8"
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_1"
Q8_TYPE = "ECONOMY"
Q9_PREFIX = "red "
Q11_NATION = "NATION_2"
Q11_FRACTION = 0.001
Q15_LO = "2000-01-01"
Q15_HI = "2000-04-01"
Q17_BRAND = "Brand#3"
Q17_SIZE_MAX = 10
Q20_PREFIX = "hot "
Q20_REGION = "ASIA"
Q20_YEAR_LO = "2000-01-01"
Q20_YEAR_HI = "2001-01-01"
Q20_MIN_QTY = 100


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DEC_REV = "CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))"


def _rev_dec() -> F.Column:
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
        "decimal(18,4)"
    )


@query(
    "tpch_q2",
    oracle=f"""
WITH supply AS (
    SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
), euro AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{Q2_REGION}'
), esupply AS (
    SELECT sp.l_partkey, sp.unit_cost, e.*
    FROM supply sp JOIN euro e ON e.s_suppkey = sp.l_suppkey
), minc AS (
    SELECT l_partkey, MIN(unit_cost) AS best_cost FROM esupply GROUP BY l_partkey
)
SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal,
       e.s_name, e.n_name, p.p_partkey, p.p_name,
       ROUND(e.unit_cost, 6)       AS unit_cost
FROM esupply e
JOIN minc m ON m.l_partkey = e.l_partkey AND e.unit_cost = m.best_cost
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_type = '{Q2_TYPE}' AND p.p_size <= {Q2_SIZE_MAX}
ORDER BY s_acctbal DESC, e.s_name, p.p_partkey
LIMIT 100
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (partsupp stand-in: observed unit cost
    MIN(l_extendedprice / l_quantity) per (part, supplier) from lineitem).
    Region-scoped suppliers join the per-part supply; the min-cost equality
    is an aggregate + self-join on the correlation key — exactly how
    Catalyst decorrelates the original's scalar subquery. Supplier/nation/
    region/part all broadcast; the only fact-sized shuffle builds `supply`.
    Unit costs are single IEEE divisions, so MIN/equality are exact."""
    li = _t(spark, sf_dir, "lineitem")
    supply = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    euro = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    esupply = supply.join(F.broadcast(euro), supply.l_suppkey == euro.s_suppkey)
    minc = esupply.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_SIZE_MAX)
    )
    return (
        esupply.alias("e")
        .join(
            minc.alias("m"),
            (F.col("e.l_partkey") == F.col("m.l_partkey"))
            & (F.col("e.unit_cost") == F.col("m.best_cost")),
        )
        .join(F.broadcast(p), F.col("e.l_partkey") == p.p_partkey)
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(ROUND(SUM({_DEC_REV}), 2) AS DOUBLE)        AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations, by shipment year. The
    disjunctive nation-pair predicate cannot push below the joins (it spans
    supplier AND customer sides), but both nation dims broadcast and the
    filtered customer/supplier sides shrink the fact before the grouped
    DECIMAL-exact revenue roll-up."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


@query(
    "tpch_q8",
    oracle=f"""
WITH all_nations AS (
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
           {_DEC_REV} AS volume,
           n1.n_name  AS supp_nation
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM all_nations
GROUP BY o_year
""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: {Q8_NATION}'s share of {Q8_TYPE}-part
    revenue sold into {Q8_REGION}, per order year. Every dimension broadcasts;
    the conditional and total volumes fold into ONE grouped aggregate
    (no self-join), both DECIMAL-exact before the final double ratio."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n2 = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("n2_key"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    vol = _rev_dec()
    nat_vol = F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(ROUND(
           l.l_extendedprice * (1 - l.l_discount)
           - 0.001 * p.p_retailprice * l.l_quantity, 4) AS DECIMAL(18,4))), 2)
         AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '{Q9_PREFIX}%'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit by (supplier nation, order year), for
    parts named '{Q9_PREFIX}…'. Supply-cost stand-in (no partsupp in the
    fixture): 0.001 * p_retailprice per unit — same expression tree in both
    engines, rounded per row then DECIMAL-summed so the profit roll-up is
    combine-order-exact. The name LIKE filter prunes the part dim to a
    broadcast sliver before the fact join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like(Q9_PREFIX + "%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    o = _t(spark, sf_dir, "orders")
    profit = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.001 * F.col("p_retailprice") * F.col("l_quantity"),
        4,
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


_Q11_SQL = f"""
WITH nat_supply AS (
    SELECT l.l_partkey,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                AS DECIMAL(18,4)) AS value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = '{Q11_NATION}'
)
SELECT l_partkey,
       CAST(SUM(value) AS DOUBLE) AS part_value
FROM nat_supply
GROUP BY l_partkey
HAVING CAST(SUM(value) AS DOUBLE) > (
    SELECT {Q11_FRACTION} * CAST(SUM(value) AS DOUBLE) FROM nat_supply
)
"""


@query("tpch_q11", oracle=_Q11_SQL)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (partsupp stand-in: revenue observed
    through {Q11_NATION}'s suppliers as the part's held value): GROUP BY +
    HAVING against an uncorrelated scalar subquery over the same CTE.
    Catalyst evaluates the total once and broadcasts it into the HAVING
    predicate; both the per-part and total sums are DECIMAL-exact so the
    threshold comparison cannot flip with combine order. Same text on both
    engines."""
    for t in ("lineitem", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q11_SQL)


@query(
    "tpch_q13",
    oracle="""
WITH c_orders AS (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (comment-pattern
    exclusion adapted to the fixture: urgent orders don't count). LEFT
    join keeps never-ordered customers at c_count=0; two cascaded counts —
    the first shuffles on custkey (map-side combinable), the second on the
    tiny distinct-count domain."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q15",
    oracle=f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(ROUND(SUM({_DEC_REV}), 2) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q15_HI} 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier of the quarter. Per-supplier revenue is
    DECIMAL-summed then fixed to 2 decimals BEFORE the max-equality gate,
    so the winner cannot depend on double combine order. The max is a
    one-row aggregate broadcast-crossed into the filter (the order_sizing
    pattern); the tiny |suppliers|-row revenue table is persisted so the
    max branch and the join branch share ONE fact scan (Spark's
    ReuseExchange does not canonicalize the two aggregate chains as equal
    — verified empirically — so the cache makes the reuse explicit)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("total_revenue"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q17_SQL = f"""
SELECT CAST(ROUND(SUM(CAST(ROUND(l.l_extendedprice, 4) AS DECIMAL(18,4)))
            / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND p.p_size < {Q17_SIZE_MAX}
  AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("tpch_q17", oracle=_Q17_SQL)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (container predicate adapted
    to p_size): the correlated scalar AVG subquery. Catalyst decorrelates
    it into a per-part aggregate joined back on the correlation key — the
    classic agg+join rewrite. Quantities are whole doubles (sums exact
    below 2^53) so 0.2*AVG is the identical IEEE value in both engines and
    the < gate picks identical rows. Same text on both engines."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


@query(
    "tpch_q20",
    oracle=f"""
WITH hot_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PREFIX}%'
), heavy AS (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM hot_parts)
      AND l.l_shipdate >= TIMESTAMP '{Q20_YEAR_LO} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{Q20_YEAR_HI} 00:00:00'
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > {Q20_MIN_QTY}
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{Q20_REGION}'
  AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
ORDER BY s.s_name
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (availqty stand-in: suppliers who
    SHIPPED more than {Q20_MIN_QTY} units of '{Q20_PREFIX}…' parts in the
    window): a two-level semi-join cascade — hot parts gate the fact scan
    (broadcast semi), the HAVING-filtered supplier list gates the
    region-scoped supplier dim (broadcast semi again). Quantity sums are
    exact whole-double arithmetic."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like(Q20_PREFIX + "%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_HI).cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_Q21_SQL = """
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate >= l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@query("tpch_q21", oracle=_Q21_SQL)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (receipt/commit dates
    adapted to ship dates: the supplier whose line shipped strictly LAST in
    a finished multi-supplier order is the straggler). The EXISTS becomes a
    LeftSemi and the NOT EXISTS a null-safe LeftAnti, both on l_orderkey
    with the inequality conditions riding the join — Catalyst's canonical
    double-correlation rewrite; no per-row subquery survives. Same text on
    both engines."""
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_SQL)
