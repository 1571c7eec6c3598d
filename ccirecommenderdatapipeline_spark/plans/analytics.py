"""Analytic-SQL breadth: multi-set grouping, reshaping (unpivot/explode),
semi-structured (JSON/map) columns, and calendar densification — the
engine-extension surface SURVEY §2.5/§2.3 notes beyond the reference's own
operators (its pandas layer reshapes imperatively; daily_function.py:1240-
1330 is the closest analogue).

Scale notes: grouping sets expand to G× the input of ONE hash aggregate
(map-side combinable, no extra scans); unpivot/posexplode are map-only row
generators (no shuffle); gap-fill produces the dense calendar per symbol
inside the symbol partition, so the only shuffle is the per-symbol one the
forward-fill window needs anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..operators.windows import bounded_window

from ..operators.lnq import LN_UNIT_SCALE, LN_UNIT_SCALE_F, ln_units, ln_units_sql
from ..operators.text import tokens
from ..sources.prices import PRICES_ORACLE_CTE, prices_view
from ..sources.tables import load_table
from .registry import query

# Exact multi-row sum of 2-decimal money (see sources/prices.py contract).
_MONEY_SUM = "CAST(SUM(CAST(ROUND({c}, 2) AS DECIMAL(18,2))) AS DOUBLE)"


def _money_sum(col: str) -> F.Column:
    return F.sum(F.round(F.col(col), 2).cast("decimal(18,2)")).cast("double")


@query(
    "grouping_sets_agg",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {_MONEY_SUM.format(c="o_totalprice")} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus),
                        (o_orderpriority), ())
""",
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup_counts/
    cube_counts) with grouping_id disambiguating real NULL groups from
    subtotal rows. One hash aggregate, 4 grouping sets, map-side
    combinable — not 4 scans."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"],
             ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            _money_sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "unpivot_measures",
    oracle="""
WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 100 = 0)
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM li
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM li
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM li
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM li
""",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via native unpivot (melt): one row per
    (line, measure). Map-only row generation — Spark's Expand node, no
    shuffle, no UDF; the oracle states the same thing as UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@query(
    "map_json_ops",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT)     AS k_val,
       CAST(len(json_keys(props)) AS INTEGER)          AS n_keys,
       array_to_string(json_keys(props), ',')          AS keys_csv,
       CAST(json_extract(props, '$.k') AS BIGINT) * 2  AS k_doubled,
       'k=' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
                                                       AS k_tagged
FROM events
""",
)
def q_map_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column surface: JSON props parsed to a typed
    MapType (from_json), then map_keys/element_at/size plus a str_to_map
    round-trip — all Catalyst JSON/map expressions, no UDF. The map stays
    internal; emitted columns are scalars so the compare pipeline hashes
    them directly."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    parsed = ev.select("event_id", m.alias("m"))
    # str_to_map round trip: render k=v pairs, reparse, read back
    rendered = F.concat_ws(
        ",",
        F.transform(
            F.map_entries("m"),
            lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
        ),
    )
    return parsed.select(
        "event_id",
        F.element_at("m", "k").alias("k_val"),
        F.size(F.map_keys("m")).cast("int").alias("n_keys"),
        F.array_join(F.map_keys("m"), ",").alias("keys_csv"),
        (F.element_at(F.str_to_map(rendered, F.lit(","), F.lit("=")), "k").cast("long") * 2).alias("k_doubled"),
        F.concat(F.lit("k="), F.element_at("m", "k").cast("string")).alias("k_tagged"),
    )


@query(
    "posexplode_tokens",
    oracle="""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z]+',
               ' ', 'g'), ' '), t -> t <> '') AS toks
    FROM documents WHERE doc_id % 5 = 0
), e AS (
    SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM tok
)
SELECT doc_id,
       CAST(p - 1 AS INTEGER)        AS pos,
       toks[p]                        AS token,
       CAST(length(toks[p]) AS INTEGER) AS token_len
FROM e
""",
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving explode (LATERAL VIEW posexplode): token stream
    with positions — the tokenizer-output shape (doc_id, pos, token) that
    downstream sequence packing consumes. Map-only row generation."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return (
        d.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            "token",
            F.length("token").cast("int").alias("token_len"),
        )
    )


@query(
    "gap_fill_daily",
    oracle="WITH " + PRICES_ORACLE_CTE + """
, px AS (SELECT * FROM prices WHERE CAST(symbol AS BIGINT) % 20 = 0)
, bounds AS (SELECT symbol, min(date) AS lo, max(date) AS hi FROM px GROUP BY 1)
, cal AS (
    SELECT symbol, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
    FROM bounds
)
SELECT cal.symbol, cal.d,
       CAST(t.date IS NOT NULL AS BOOLEAN) AS is_trading,
       a.close_pr                           AS close_ff,
       CAST(cal.d - a.date AS INTEGER)      AS stale_days
FROM cal
LEFT JOIN px t ON t.symbol = cal.symbol AND t.date = cal.d
ASOF LEFT JOIN px a ON a.symbol = cal.symbol AND cal.d >= a.date
""",
)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill (gap fill): every symbol gets
    one row per calendar day between its first and last trade, carrying the
    last known close and its staleness. The dense calendar is generated
    per-symbol with sequence()+explode INSIDE the symbol partition, and the
    forward fill is last(ignoreNulls) over the same per-symbol ordering —
    so the whole query is one shuffle on symbol (the oracle states the fill
    as an ASOF join, Spark as the equivalent running window)."""
    px = prices_view(spark, sf_dir).filter(
        F.col("symbol").cast("long") % 20 == 0
    ).select("symbol", "date", "close_pr")
    cal = (
        px.groupBy("symbol")
        .agg(F.min("date").alias("lo"), F.max("date").alias("hi"))
        .select(
            "symbol",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
        )
    )
    joined = cal.join(
        px.select("symbol", F.col("date").alias("d"), "close_pr"),
        ["symbol", "d"],
        "left",
    )
    w = Window.partitionBy("symbol").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    trade_d = F.when(F.col("close_pr").isNotNull(), F.col("d"))
    return joined.select(
        "symbol", "d",
        F.col("close_pr").isNotNull().alias("is_trading"),
        F.last("close_pr", ignorenulls=True).over(w).alias("close_ff"),
        F.datediff(F.col("d"), F.last(trade_d, ignorenulls=True).over(w))
        .cast("int")
        .alias("stale_days"),
    )


@query(
    "percentile_battery",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT)                              AS n,
       ROUND(quantile_disc(l_quantity, 0.25), 6)             AS q25_disc,
       ROUND(quantile_cont(l_quantity, 0.5), 6)              AS q50_cont,
       ROUND(quantile_cont(l_quantity, 0.75), 6)             AS q75_cont,
       ROUND(quantile_disc(l_quantity, 0.9), 6)              AS q90_disc,
       ROUND(median(l_extendedprice), 4)                     AS median_price,
       ROUND(quantile_cont(l_discount, [0.1, 0.5, 0.9])[2], 6) AS disc_mid
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile battery (F6 generalized): PERCENTILE_DISC /
    PERCENTILE_CONT / median per return flag. Exact percentiles require the
    per-group sort — Spark runs them as a single sort-based aggregate over
    one shuffle on the 3-value group key; at 100 TB grain this is the op to
    swap for approx_percentile, which is why both live in the registry
    (cf. quantile_disc). Interpolated values are rounded on both engines so
    last-ulp interpolation differences cannot flip the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)"), 6
        ).alias("q25_disc"),
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 6
        ).alias("q50_cont"),
        F.round(
            F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)"), 6
        ).alias("q75_cont"),
        F.round(
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)"), 6
        ).alias("q90_disc"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_discount)"), 6
        ).alias("disc_mid"),
    )


@query(
    "sketch_accuracy",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       TRUE AS approx_users_ok,
       ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
       TRUE AS approx_p50_ok
FROM events
GROUP BY event_type
""",
)
def q_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates under an accuracy CONTRACT: HLL++
    approx_count_distinct (rsd 2%) and percentile_approx must land within
    10% of their exact counterparts, asserted as booleans the oracle pins
    to TRUE — so a sketch drifting out of tolerance is a driver-visible
    FAIL, not a silent estimate. At 100 TB the approx forms are the
    defaults (mergeable constant-size state, no per-group sort / expand);
    the exact forms here are the auditors."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("n_users_approx"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("p50x"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50a"),
    )
    tol = lambda a, b: (F.abs(a - b) <= 0.10 * F.abs(b))  # noqa: E731
    return g.select(
        "event_type",
        "n_users_exact",
        tol(F.col("n_users_approx"), F.col("n_users_exact")).alias("approx_users_ok"),
        F.round("p50x", 6).alias("p50_exact"),
        tol(F.col("p50a"), F.col("p50x")).alias("approx_p50_ok"),
    )


N_SALTS = 8


@query(
    "salted_join",
    oracle="""
WITH dim AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(e.value, 6) AS DECIMAL(18,6)) * d.type_n) AS DOUBLE)
           AS weighted_value
FROM events e JOIN dim d ON d.event_type = e.event_type
GROUP BY e.event_type
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated shuffle join: the join key (event_type, 5 values) is
    maximally hot, so a plain shuffle join puts 1/5 of the fact on one
    task. Salting splits every hot key 8 ways — fact rows get
    salt = pmod(event_id, 8), the dim replicates x8 — and the shuffled-hash
    join (hinted, so the tiny demo dim is not broadcast away) runs on
    (event_type, salt) with uniform partitions. The companion two-phase
    salted AGGREGATION is `salted_agg`; AQE's skewJoin does this
    adaptively at runtime, this query is the explicit planned form. The
    oracle is the unsalted join."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_n"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])).alias("salt")
    dim_x = dim.select("event_type", "type_n", salts)
    fact = ev.select(
        "event_type",
        "value",
        F.pmod(F.col("event_id"), F.lit(N_SALTS)).cast("int").alias("salt"),
    )
    joined = fact.join(dim_x.hint("shuffle_hash"), ["event_type", "salt"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round("value", 6).cast("decimal(18,6)") * F.col("type_n"))
        .cast("double")
        .alias("weighted_value"),
    )


@query(
    "rank_battery2",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(NTILE(4) OVER w AS INTEGER)            AS quartile,
       ROUND(PERCENT_RANK() OVER w, 8)             AS pct_rank,
       ROUND(CUME_DIST() OVER w, 8)                AS cume,
       NTH_VALUE(l_quantity, 2) OVER (PARTITION BY l_returnflag
           ORDER BY l_quantity, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_lowest_qty
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber)
""",
)
def q_rank_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank window family (complements rank_battery's
    row_number/rank/dense_rank/lag/lead): NTILE quartiles, PERCENT_RANK,
    CUME_DIST, and a full-frame NTH_VALUE — all over ONE total order
    (unique tie-break keys appended), so every function is deterministic
    and the single sort serves all four. percent_rank/cume_dist are exact
    rationals k/n in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
        F.nth_value("l_quantity", 2).over(wf).alias("second_lowest_qty"),
    )


@query(
    "variant_json_stats",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                       AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS n_distinct_k
FROM events
GROUP BY event_type
""",
)
def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type: the JSON
    props column is parsed ONCE into the binary variant encoding
    (parse_json), then typed paths are extracted with try_variant_get —
    the shred-on-read shape that replaces per-access string re-parsing
    (get_json_object re-parses the string for every path). The oracle uses
    DuckDB's native JSON extraction over the same column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


@query(
    "collated_grouping",
    oracle="""
WITH mixed AS (
    SELECT CASE WHEN event_id % 2 = 1
                THEN upper(substr(event_type, 1, 1)) || substr(event_type, 2)
                ELSE event_type END AS label,
           value
    FROM events
)
SELECT lower(label) AS label_ci,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM mixed
GROUP BY lower(label)
""",
)
def q_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive semantics via Spark 4 COLLATIONS: half the labels
    are re-cased, then grouped under UTF8_LCASE collation — the engine-level
    replacement for sprinkling lower() into every predicate (collation-aware
    grouping keeps codegen and statistics, and at scale avoids a projection
    over every grouping column). Output is normalized with lower() so the
    representative-label choice cannot differ between engines; DuckDB
    expresses the same semantics with lower() directly."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(
            F.col("event_id") % 2 == 1, F.initcap(F.col("event_type"))
        ).otherwise(F.col("event_type")).alias("label"),
        "value",
    )
    return (
        mixed.groupBy(F.collate("label", "UTF8_LCASE").alias("label_cs"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            F.lower(F.col("label_cs")).cast("string").alias("label_ci"), "n", "sum_value"
        )
    )


@query(
    "xml_extract",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
)
def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 from_xml): each event is rendered as
    an XML fragment, parsed back through the schema'd XML reader, and
    aggregated from the PARSED struct — proving the XML codec path
    round-trips typed values. The oracle computes the same rollup from the
    original JSON column, so any parse drift breaks the hash."""
    ev = load_table(spark, sf_dir, "events")
    xml = ev.select(
        F.concat(
            F.lit("<e><k>"),
            F.get_json_object("props", "$.k"),
            F.lit("</k><t>"),
            F.col("event_type"),
            F.lit("</t></e>"),
        ).alias("x")
    )
    parsed = xml.select(F.from_xml("x", "k BIGINT, t STRING").alias("p"))
    return parsed.groupBy(F.col("p.t").alias("event_type")).agg(
        F.count("*").alias("n"),
        F.sum("p.k").alias("sum_k"),
    )


@query(
    "linear_interpolate",
    oracle="WITH " + PRICES_ORACLE_CTE + """
, px AS (SELECT symbol, date, close_pr FROM prices WHERE CAST(symbol AS BIGINT) % 20 = 0)
, bounds AS (SELECT symbol, min(date) AS lo, max(date) AS hi FROM px GROUP BY 1)
, cal AS (
    SELECT symbol, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
    FROM bounds
)
SELECT cal.symbol, cal.d,
       CAST(t.date IS NOT NULL AS BOOLEAN) AS is_trading,
       CASE
           WHEN t.date IS NOT NULL THEN t.close_pr
           WHEN b.date IS NULL     THEN a.close_pr
           ELSE ROUND(a.close_pr + (b.close_pr - a.close_pr)
                * (CAST(cal.d - a.date AS INTEGER)
                   / CAST(b.date - a.date AS INTEGER)), 8)
       END AS close_interp,
       CASE
           WHEN t.date IS NOT NULL THEN 'exact'
           WHEN b.date IS NULL     THEN 'locf'
           ELSE 'interp'
       END AS interp_kind
FROM cal
LEFT JOIN px t ON t.symbol = cal.symbol AND t.date = cal.d
ASOF LEFT JOIN px a ON a.symbol = cal.symbol AND cal.d >= a.date
ASOF LEFT JOIN px b ON b.symbol = cal.symbol AND cal.d <= b.date
""",
)
def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation over the dense calendar: non-trading
    days get the straight line between the previous and next trading close
    (LOCF past the last trade; exact on trading days) — resampling for
    models that need gap-free daily series. Spark states the fill as two
    ignoreNulls running windows (backward last + forward first) inside the
    per-symbol partition — ONE shuffle total; the oracle states it as the
    equivalent pair of ASOF joins. The interpolation expression tree is
    identical in both engines (int/int day-fraction, one multiply, one
    add), so values match bit-exactly before the defensive ROUND."""
    px = prices_view(spark, sf_dir).filter(
        F.col("symbol").cast("long") % 20 == 0
    ).select("symbol", "date", "close_pr")
    cal = (
        px.groupBy("symbol")
        .agg(F.min("date").alias("lo"), F.max("date").alias("hi"))
        .select(
            "symbol",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
        )
    )
    joined = cal.join(
        px.select("symbol", F.col("date").alias("d"), "close_pr"),
        ["symbol", "d"],
        "left",
    )
    wb = Window.partitionBy("symbol").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # r16: the forward fill used a [current, unboundedFollowing) frame
    # with first(ignoreNulls) — Spark's UnboundedFollowing frame
    # RE-SCANS the whole remaining partition per row (O(n^2) per
    # symbol; measured 4.1 s per forward window function vs 0.86 s for
    # the running backward frame on the same data). The same value —
    # the nearest non-null at d' >= d — is a RUNNING last(ignoreNulls)
    # over the DESCENDING-d order, an O(n) streaming frame. (symbol, d)
    # is unique after the calendar join, so the two orders select the
    # identical row and the fill is bit-identical.
    wf = Window.partitionBy("symbol").orderBy(F.desc("d")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_c = F.last("close_pr", ignorenulls=True).over(wb)
    prev_d = F.last(F.when(F.col("close_pr").isNotNull(), F.col("d")), True).over(wb)
    next_c = F.last("close_pr", ignorenulls=True).over(wf)
    next_d = F.last(F.when(F.col("close_pr").isNotNull(), F.col("d")), True).over(wf)
    frac = F.datediff(F.col("d"), prev_d) / F.datediff(next_d, prev_d)
    return joined.select(
        "symbol",
        "d",
        F.col("close_pr").isNotNull().alias("is_trading"),
        F.when(F.col("close_pr").isNotNull(), F.col("close_pr"))
        .when(next_c.isNull(), prev_c)
        .otherwise(F.round(prev_c + (next_c - prev_c) * frac, 8))
        .alias("close_interp"),
        F.when(F.col("close_pr").isNotNull(), "exact")
        .when(next_c.isNull(), "locf")
        .otherwise("interp")
        .alias("interp_kind"),
    )


# --- null-semantics battery --------------------------------------------------
# Engines disagree BY DEFAULT here (Spark sorts nulls first ascending,
# DuckDB last; SQL '=' never matches NULL), so each query states the
# placement/match rule explicitly on both sides — the portability contract
# a multi-engine shop needs pinned.


@query(
    "null_safe_join",
    oracle="""
WITH a AS (
    SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 100 END AS k,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
), b AS (
    SELECT CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_orderkey % 100 END AS k,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY 1
)
SELECT a.k AS k, a.n_orders, b.n_lines
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the NULL group
    on each side matches the NULL group on the other — plain `=` silently
    drops it, the classic missing-rows bug when a join key is nullable.
    Spark still hash-partitions on the null-safe key, so the plan is an
    ordinary shuffle join, not a cartesian fallback."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.groupBy(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderkey") % 100).alias("k")
    ).agg(F.count("*").alias("n_orders"))
    b = li.groupBy(
        F.when(F.col("l_orderkey") % 11 == 0, None)
        .otherwise(F.col("l_orderkey") % 100).alias("k")
    ).agg(F.count("*").alias("n_lines"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_orders", "n_lines"
    )


@query(
    "explode_outer_battery",
    oracle="""
WITH arrs AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN CAST([] AS VARCHAR[])
                ELSE ['a', 'b', 'c'] END AS arr
    FROM documents
)
SELECT doc_id, t.tok
FROM arrs, UNNEST(arr) AS t(tok)
UNION ALL
SELECT doc_id, CAST(NULL AS VARCHAR)
FROM arrs WHERE len(arr) = 0
""",
)
def q_explode_outer_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with EMPTY arrays survive as a single
    null-element row (plain explode drops them — a silent data-loss corner
    when flattening sparse nested data). The oracle states the same
    semantics as unnest UNION the empty-array remainder."""
    d = load_table(spark, sf_dir, "documents")
    arrs = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.array().cast("array<string>"))
        .otherwise(F.array(F.lit("a"), F.lit("b"), F.lit("c")))
        .alias("arr"),
    )
    return arrs.select("doc_id", F.explode_outer("arr").alias("tok"))


@query(
    "null_ordering_battery",
    oracle="""
WITH v AS (
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS val
    FROM orders
), r AS (
    SELECT o_orderstatus, o_orderkey, val,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY val ASC NULLS LAST, o_orderkey) AS rn_last,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY val DESC NULLS FIRST, o_orderkey) AS rn_first
    FROM v
)
SELECT o_orderstatus, o_orderkey, val, rn_last, rn_first
FROM r WHERE rn_last <= 3 OR rn_first <= 3
""",
)
def q_null_ordering_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null placement in ORDER BY: Spark defaults to NULLS FIRST
    ascending while DuckDB (per standard) defaults to NULLS LAST, so any
    cross-engine ranking over a nullable key MUST state the placement —
    both directions pinned here (asc_nulls_last / desc_nulls_first) with
    a key tie-break."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey", "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_totalprice")).alias("val"),
    )
    w_last = Window.partitionBy("o_orderstatus").orderBy(
        F.col("val").asc_nulls_last(), F.col("o_orderkey")
    )
    w_first = Window.partitionBy("o_orderstatus").orderBy(
        F.col("val").desc_nulls_first(), F.col("o_orderkey")
    )
    return (
        v.withColumn("rn_last", F.row_number().over(w_last))
        .withColumn("rn_first", F.row_number().over(w_first))
        .filter((F.col("rn_last") <= 3) | (F.col("rn_first") <= 3))
        .select("o_orderstatus", "o_orderkey", "val", "rn_last", "rn_first")
    )


@query(
    "param_sql_revenue",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09
GROUP BY l_returnflag
""",
)
def q_param_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named-parameter API): the query text
    carries :start/:end/:lo/:hi placeholders and values bind server-side as
    LITERALS — injection-proof AND constant-foldable, so predicate
    pushdown sees real constants (the string-interpolation alternative is
    neither). The view registration + spark.sql(..., args=...) path is the
    BI/report surface of the engine; revenue is the decimal-exact 4-dec
    product sum per the prices contract."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem_v
        WHERE l_shipdate >= :start AND l_shipdate < :end
          AND l_discount BETWEEN :lo AND :hi
        GROUP BY l_returnflag
        """,
        args={
            "start": "1998-01-01",
            "end": "1999-01-01",
            "lo": 0.02,
            "hi": 0.09,
        },
    )


# --- Differentially-private noisy counts (deterministic calibration rig) -----

DP_SEED = "dp1:"
DP_B = 2.0       # Laplace scale b = sensitivity/epsilon = 1/0.5
DP_LN_DP = 9     # ln() rounding (libm 1-ulp guard)
DP_NOISE_DP = 6  # noise rounding


@query(
    "dp_noisy_counts",
    oracle=f"""
WITH agg AS (
    SELECT p.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS true_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
), h AS (
    SELECT brand, true_cnt,
           ('0x' || substr(md5('{DP_SEED}' || brand), 1, 13))::BIGINT AS hm,
           ('0x' || substr(md5('{DP_SEED}' || brand), 14, 1))::BIGINT % 2
               AS sgn
    FROM agg
), n AS (
    SELECT brand, true_cnt,
           ROUND((1 - 2 * sgn) * {DP_B}
                 * ROUND(ln(2.0 * (hm + 1) / CAST(POW(2, 53) AS DOUBLE)),
                         {DP_LN_DP}), {DP_NOISE_DP}) AS noise
    FROM h
)
SELECT brand, true_cnt, noise,
       ROUND(true_cnt + noise, {DP_NOISE_DP}) AS noisy_cnt,
       ROUND(abs(noise), {DP_NOISE_DP}) AS abs_err
FROM n
""",
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy counts — the differential-privacy release
    shape for a count table (per-brand purchase counts, sensitivity 1,
    b = {DP_B}): noise = sign * b * Exp(1), with the exponential drawn by
    inverse-CDF from an md5-dyadic uniform and the sign from an
    independent hex digit. This rig is DETERMINISTIC on purpose — it is
    the calibration/test harness for the release pipeline (realized
    per-cell error vs the mechanism's b*ln(..) envelope); a production
    release swaps the md5 draw for a real CSPRNG, everything else —
    bounded-key agg, per-cell noise, release projection — is this exact
    plan. The true/noisy columns sit side-by-side because this IS the
    calibration view, not the public release.

    Determinism: the uniform u = 2(h+1)/2^53 = (h+1)/2^52 is an exact
    dyadic double on (0, 1] (weighted_sample_wr's construction,
    sampling.py:150); ln is rounded
    at {DP_LN_DP}dp before the scale multiply, noise at {DP_NOISE_DP}dp —
    bit-stable across engines.

    100-TB shape: map-combinable count agg on the bounded brand key, then
    map-only noise over |V| rows."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").cast("long").alias("true_cnt"))
    )
    md5 = F.md5(F.concat(F.lit(DP_SEED), F.col("brand")))
    h = agg.select(
        "brand",
        "true_cnt",
        F.conv(F.substring(md5, 1, 13), 16, 10).cast("long").alias("hm"),
        (F.conv(F.substring(md5, 14, 1), 16, 10).cast("long") % 2).alias("sgn"),
    )
    noise = F.round(
        (F.lit(1) - F.lit(2) * F.col("sgn"))
        * F.lit(DP_B)
        * F.round(
            F.log(F.lit(2.0) * (F.col("hm") + 1) / F.lit(float(2**53))),
            DP_LN_DP,
        ),
        DP_NOISE_DP,
    )
    n = h.select("brand", "true_cnt", noise.alias("noise"))
    return n.select(
        "brand",
        "true_cnt",
        "noise",
        F.round(F.col("true_cnt") + F.col("noise"), DP_NOISE_DP).alias("noisy_cnt"),
        F.round(F.abs(F.col("noise")), DP_NOISE_DP).alias("abs_err"),
    )


# --- Kaplan-Meier survival: time to repeat purchase ---------------------------

# per-step ln(1 - d/n) quantized to integer nano-nats (operators/lnq.py,
# r11 rule): the cumulative log-sum is exact integer math; exp runs once
# per row on bit-identical doubles (one residual transcendental boundary
# per readout, the structural minimum)
_KM_LNU_SQL = ln_units_sql("1.0 - d / CAST(n_risk AS DOUBLE)")


@query(
    "kaplan_meier_survival",
    oracle=f"""
WITH seq AS (
    SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS dt,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
), mx AS (
    SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders
), subj AS (
    SELECT f.ck,
           CASE WHEN s.dt IS NOT NULL THEN date_diff('day', f.dt, s.dt)
                ELSE date_diff('day', f.dt, mx.md) END AS t,
           CASE WHEN s.dt IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM (SELECT ck, dt FROM seq WHERE rn = 1) f
    LEFT JOIN (SELECT ck, dt FROM seq WHERE rn = 2) s USING (ck)
    CROSS JOIN mx
), agg AS (
    SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM subj GROUP BY 1
), risk AS (
    SELECT t, d, CAST(SUM(c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
    FROM agg
), steps AS (
    SELECT t, d, n_risk,
           {_KM_LNU_SQL} AS lnu
    FROM risk WHERE d > 0 AND d < n_risk
)
SELECT t, d, n_risk,
       ROUND(exp(CAST(SUM(lnu) OVER (ORDER BY t) AS DOUBLE)
                 / {LN_UNIT_SCALE}.0), 8) AS survival
FROM steps
""",
)
def q_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimator for time-to-repeat-purchase:
    each customer contributes the gap between their first and second
    order, RIGHT-CENSORED at the corpus horizon for one-order customers
    — survival analysis done correctly (dropping censored customers
    would bias S(t) down), the lifecycle readout next to
    ``retention_cohorts``'s calendar grid. S(t) = prod_{{t_i<=t}}
    (1 - d_i/n_i) with n_i the at-risk count (a DESC cumulative count
    over the time axis).

    Determinism (r11 ln-quantization rule): the product runs in LOG
    space — ln(1 - d/n) of exact int ratios quantized to integer
    nano-nats, accumulated as an exact BIGINT running sum, exp'd once
    per row on bit-identical doubles and rounded at 8dp. The two windows
    order the EVENT-TIME axis — bounded by the calendar span, never by
    customers (the subject agg collapses first).

    100-TB shape: one per-customer rank (bounded partitions), a
    time-grain agg, then calendar-bounded windows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("dt")
    )
    w = Window.partitionBy("o_custkey").orderBy("dt", "o_orderkey")
    seq = o.withColumn("rn", F.row_number().over(w))
    first = seq.where(F.col("rn") == 1).select(
        F.col("o_custkey").alias("ck"), F.col("dt").alias("d1")
    )
    second = seq.where(F.col("rn") == 2).select(
        F.col("o_custkey").alias("ck"), F.col("dt").alias("d2")
    )
    mx = o.agg(F.max("dt").alias("md"))
    subj = (
        first.join(second, "ck", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("md", "d1"))
            .cast("long")
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    agg = subj.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"), F.count("*").cast("long").alias("c")
    )
    wd = bounded_window(
        F.desc("t"),
        bound="per-duration aggregate bounded by the calendar span in days",
        queries=("kaplan_meier_survival",),
    ).rowsBetween(Window.unboundedPreceding, 0)
    risk = agg.select(
        "t", "d", F.sum("c").over(wd).cast("long").alias("n_risk")
    )
    steps = risk.where((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        "t",
        "d",
        "n_risk",
        ln_units(
            F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double")
        ).alias("lnu"),
    )
    wu = bounded_window(
        "t",
        bound="KM risk-set steps bounded by the calendar span in days",
        queries=("kaplan_meier_survival",),
    ).rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        "t",
        "d",
        "n_risk",
        F.round(
            F.exp(
                F.sum("lnu").over(wu).cast("double")
                / F.lit(LN_UNIT_SCALE_F)
            ),
            8,
        ).alias("survival"),
    )


# --- Mergeable quantile summary (two-level MRL-style merge) ------------------

QSK_B = 8       # partial summaries (level-0 compactors) per group
QSK_CAP = 32    # target samples per partial summary
QSK_QS = (0.1, 0.5, 0.9)


# shared with streaming/jobs.py:stream_quantile_sketch — the contract is
# identical whatever the batching: exact quantiles + TRUE-pinned bounds.
QSK_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)               AS n,
       ROUND(quantile_cont(value, 0.1), 6)    AS q10_exact,
       ROUND(quantile_cont(value, 0.5), 6)    AS q50_exact,
       ROUND(quantile_cont(value, 0.9), 6)    AS q90_exact,
       TRUE AS sketch_q10_ok, TRUE AS sketch_q50_ok, TRUE AS sketch_q90_ok,
       TRUE AS summary_sublinear
FROM events
GROUP BY event_type
"""


@query("quantile_sketch_merge", oracle=QSK_ORACLE)
def q_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE approximate-quantile summary with a PROVEN error bound —
    the deterministic Munro-Paterson/MRL two-level shape (Manku,
    Rajagopalan & Lindsay, SIGMOD'98) that completes the sketch family
    next to HLL (max-merge), Bloom (or-merge) and CMS (add-merge):

    1. split each group into B={QSK_B} deterministic md5 buckets (the
       "partial sketches" a 1000-executor job builds independently);
    2. per bucket, keep every k-th value of the bucket's sort order with
       weight k (k scales as n/(B*CAP) — summary size is CONSTANT per
       bucket, so total state is B*CAP rows however large n grows);
    3. MERGE = union the B weighted summaries (this is the whole merge
       operator — no resort against raw data) and read quantiles off the
       cumulative-weight curve.

    Error guarantee (proved in-plan, driver-checked): for any threshold t
    the merged weight W(t) ∈ (C(t) - B*k, C(t)] where C is the true CDF,
    so the rank of the q-estimate lands within 2*B*k + B + 1 of q*n; the
    booleans assert exactly that bound against EXACT ranks computed from
    the raw data, and the oracle pins them TRUE — a sketch drifting out
    of its guarantee is a driver-visible hash FAIL (the sketch_accuracy
    contract pattern). Exact quantiles ride along as the audited values.

    100-TB design: the per-bucket window sorts 1/(B) of a group per task;
    the merged summary is B*CAP rows per group (sub-linear state, the
    reason mergeable summaries exist); the exact-rank audit is one
    broadcast join + one scan — it is the TEST, not the production path.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_g"))
    kcol = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.col("n_g") / (QSK_B * QSK_CAP)).cast("long"),
    ).alias("k")
    dims = F.broadcast(counts.select("event_type", "n_g", kcol))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("qsk8:"), F.col("event_id").cast("string"))),
                1, 4,
            ),
            16, 10,
        ).cast("long")
        % QSK_B
    )
    w_local = Window.partitionBy("event_type", "b").orderBy("value", "event_id")
    samp = (
        ev.join(dims, "event_type")
        .withColumn("b", bucket)
        .withColumn("rn", F.row_number().over(w_local))
        .where(F.col("rn") % F.col("k") == 0)
        .select("event_type", "value", F.col("k").alias("wt"))
    )
    tot = samp.groupBy("event_type").agg(
        F.sum("wt").cast("long").alias("w_total"),
        F.count("*").cast("long").alias("summary_rows"),
    )
    # RANGE frame so tied values share one cumulative weight (deterministic)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        samp.withColumn("cw", F.sum("wt").over(w_cum))
        .join(F.broadcast(tot), "event_type")
    )
    ests = cum.groupBy("event_type").agg(
        *[
            F.min(
                F.when(
                    F.col("cw") >= F.ceil(F.lit(q) * F.col("w_total")),
                    F.col("value"),
                )
            ).alias(f"est_{int(q * 100)}")
            for q in QSK_QS
        ]
    )
    audit = (
        ev.join(F.broadcast(ests), "event_type")
        .join(dims, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.first("k").alias("k"),
            *[
                F.count(
                    F.when(F.col("value") < F.col(f"est_{int(q * 100)}"), 1)
                ).cast("long").alias(f"lo_{int(q * 100)}")
                for q in QSK_QS
            ],
            *[
                F.count(
                    F.when(F.col("value") <= F.col(f"est_{int(q * 100)}"), 1)
                ).cast("long").alias(f"hi_{int(q * 100)}")
                for q in QSK_QS
            ],
            F.round(
                F.expr("percentile_cont(0.1) WITHIN GROUP (ORDER BY value)"), 6
            ).alias("q10_exact"),
            F.round(
                F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)"), 6
            ).alias("q50_exact"),
            F.round(
                F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)"), 6
            ).alias("q90_exact"),
        )
    )
    slack = 2 * QSK_B * F.col("k") + QSK_B + 1

    def ok(q: float) -> F.Column:
        p = int(q * 100)
        return (
            (F.col(f"lo_{p}") <= F.lit(q) * F.col("n") + slack)
            & (F.col(f"hi_{p}") >= F.lit(q) * F.col("n") - slack)
        ).alias(f"sketch_q{p}_ok")

    return (
        audit.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "n",
            "q10_exact", "q50_exact", "q90_exact",
            ok(0.1), ok(0.5), ok(0.9),
            # summary_rows = sum_b floor(m_b/k) <= n/k <= 2*B*CAP: with
            # x = n/(B*CAP), k = max(1, floor(x)) and x/floor(x) <= 2 for
            # x >= 1 (k=1 only while n < 2*B*CAP). Constant-state proof.
            (F.col("summary_rows") <= 2 * QSK_B * QSK_CAP).alias(
                "summary_sublinear"
            ),
        )
    )


# --- Weighted quantiles (exact, two-phase) -----------------------------------

WM_QS = ((25, 0.25), (50, 0.5), (75, 0.75))


@query(
    "weighted_median",
    oracle="""
WITH t AS (
    SELECT l_returnflag AS flag, l_extendedprice AS v,
           CAST(l_quantity AS BIGINT) AS wt,
           l_orderkey * 8 + l_linenumber AS lid
    FROM lineitem
), c AS (
    SELECT flag, v,
           SUM(wt) OVER (PARTITION BY flag ORDER BY v, lid
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rsum
    FROM t
), w AS (SELECT flag, CAST(SUM(wt) AS BIGINT) AS total_weight FROM t GROUP BY 1)
SELECT c.flag AS l_returnflag, w.total_weight,
       MIN(c.v) FILTER (WHERE c.rsum >= CEIL(0.25 * w.total_weight)) AS wq25,
       MIN(c.v) FILTER (WHERE c.rsum >= CEIL(0.5  * w.total_weight)) AS wq50,
       MIN(c.v) FILTER (WHERE c.rsum >= CEIL(0.75 * w.total_weight)) AS wq75
FROM c JOIN w ON w.flag = c.flag
GROUP BY 1, 2
""",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted quantiles (weighted median + quartiles) of
    extended price weighted by quantity, per return flag — the
    order-statistic no Spark builtin covers (``percentile`` has no weight
    argument; ``percentile_approx`` is unweighted too). The weighted
    q-quantile is the smallest value whose INCLUSIVE running weight in
    (value, id) order reaches ceil(q * W).

    Plan: the running weight comes from ``two_phase_rank``'s ``sum_col``
    machinery (plans/training.py) with ``bucket=floor(v/1000)`` — a
    value-monotone bucketing, so the global (value, id) running sum is
    assembled from within-bucket running sums + broadcast cumulative
    bucket offsets. NO per-flag single-task sort: a plain
    ``SUM() OVER (PARTITION BY flag ORDER BY v)`` would serialize each
    flag (3 groups = 3 tasks at 100 TB); here parallelism is
    flags x price-buckets. Integer weights (quantities are integral —
    pinned by the BIGINT cast) make every running sum exact, so the
    threshold comparison is engine-exact and the picked values are raw
    input doubles: bit-stable, no rounding anywhere.

    The oracle states the same statistic as the one-window form, proving
    the two-phase decomposition exact (the two_phase_rank contract)."""
    from .training import two_phase_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lid"),
    )
    ranked = two_phase_rank(
        li,
        key_col="v",
        part_cols=("flag",),
        id_col="lid",
        sum_col="wt",
        bucket=F.floor(F.col("v") / 1000),
    )
    totals = li.groupBy("flag").agg(
        F.sum("wt").cast("long").alias("total_weight")
    )
    cum = ranked.join(F.broadcast(totals), "flag")
    return (
        cum.groupBy(F.col("flag").alias("l_returnflag"), "total_weight")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("rsum") >= F.ceil(F.lit(q) * F.col("total_weight")),
                        F.col("v"),
                    )
                ).alias(f"wq{p}")
                for p, q in WM_QS
            ]
        )
    )
