"""Event-analytics battery over ``events`` — funnels, cohorts,
multi-resolution rollups, SCD2 histories, per-key heavy hitters (north-star
surface: the product-analytics shapes a clickstream warehouse runs; the
reference's closest analogue is the signal-count rollup layer,
daily_function.py:1103-1150).

Scale notes:
- every query shuffles on ``user_id`` (or an hour/day bucket) exactly once;
  follow-up windows/aggregations reuse the same partitioning, so Catalyst
  inserts no second Exchange;
- the funnel's sequential stage dependency is expressed as three
  aggregate+join passes over the SAME user_id partitioning (co-partitioned
  shuffle joins, no broadcast needed at any scale);
- the two-level rollup keeps hour-grain sums as DECIMAL(18,6) so the
  day-grain re-aggregation is exact regardless of combine order — the
  invariant that makes rollups incrementally maintainable at 100 TB;
- heavy-hitter top-3 ranks prune map-side via WindowGroupLimit before the
  rank shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.lnq import LN_UNIT_SCALE, LN_UNIT_SCALE_F, ln_units, ln_units_sql
from ..sources.tables import load_table
from .registry import query

# Exact multi-row sum of event values (6-decimal fixture data).
_SUM_DEC = "SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6)))"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _sum_dec(col: str = "value") -> F.Column:
    return F.sum(F.round(F.col(col), 6).cast("decimal(18,6)"))


@query(
    "funnel_analysis",
    oracle="""
WITH v AS (
    SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
    FROM events GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS c_ts
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > v.v_ts
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS p_ts
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    GROUP BY e.user_id
)
SELECT v.user_id,
       epoch_us(v.v_ts) AS view_us,
       epoch_us(c.c_ts) AS click_us,
       epoch_us(p.p_ts) AS purchase_us,
       CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                 WHEN c.c_ts IS NOT NULL THEN 2
                 WHEN v.v_ts IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS stage
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
""",
)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel per user: each stage is the
    first qualifying event strictly after the previous stage's timestamp.
    Three aggregate passes, all partitioned by user_id — the sequential
    dependency is inherent to funnel semantics; the joins are
    co-partitioned, so the plan holds one logical shuffle key end-to-end."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v_ts")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("v_ts").alias("view_us"),
            F.unix_micros("c_ts").alias("click_us"),
            F.unix_micros("p_ts").alias("purchase_us"),
            F.when(F.col("p_ts").isNotNull(), 3)
            .when(F.col("c_ts").isNotNull(), 2)
            .when(F.col("v_ts").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
    )


@query(
    "retention_cohorts",
    oracle="""
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
    FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.activity_week) // 7 AS INTEGER) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity a JOIN firsts f ON f.user_id = a.user_id
GROUP BY 1, 2
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort = ISO week of a user's first
    event; each (cohort, offset) cell counts users active that many weeks
    later. distinct-(user, week) activity collapses map-side before the
    cohort join; both joins and aggregations ride the user_id shuffle."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("activity_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "rollup_multires",
    oracle=f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h,
           COUNT(*) AS n,
           {_SUM_DEC} AS sv
    FROM events GROUP BY 1
)
SELECT CAST(date_trunc('day', h) AS DATE) AS day,
       CAST(SUM(n) AS BIGINT)             AS n_events,
       CAST(SUM(sv) AS DOUBLE)            AS sum_value,
       CAST(COUNT(*) AS BIGINT)           AS n_hours_active,
       CAST(MAX(n) AS BIGINT)             AS peak_hour_events
FROM hourly GROUP BY 1
""",
)
def q_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the day grain re-aggregates
    the HOUR grain, not the raw events — the incremental-maintenance shape
    (a streaming hourly rollup keeps the daily one consistent for free).
    Hour sums stay DECIMAL until the day grain, so re-aggregation is exact
    under any combine order; count/max decompose trivially."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("n"), _sum_dec().alias("sv")
    )
    return hourly.groupBy(F.to_date(F.date_trunc("day", F.col("h"))).alias("day")).agg(
        F.sum("n").alias("n_events"),
        F.sum("sv").cast("double").alias("sum_value"),
        F.count("*").alias("n_hours_active"),
        F.max("n").alias("peak_hour_events"),
    )


@query(
    "scd2_dimension",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
    SELECT user_id, event_type AS state, ts, event_id
    FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
       epoch_us(ts)                         AS valid_from_us,
       epoch_us(LEAD(ts) OVER w)            AS valid_to_us,
       (LEAD(ts) OVER w IS NULL)            AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: collapse each user's event_type stream into
    state-change rows with [valid_from, valid_to) intervals and a current
    flag — the MERGE-free way to maintain a slowly-changing dimension from
    an append-only event log. Both window passes share the user_id shuffle
    (the change filter preserves sort order, so no re-Exchange)."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.row_number().over(w2).cast("int").alias("version"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2)).alias("valid_to_us"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@query(
    "heavy_hitters",
    oracle="""
WITH counts AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
), totals AS (
    SELECT user_id, SUM(n) AS total FROM counts GROUP BY user_id
), ranked AS (
    SELECT c.user_id, c.event_type, c.n,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.user_id
                ORDER BY c.n DESC, c.event_type) AS INTEGER) AS rnk,
           ROUND(c.n / t.total, 6) AS share
    FROM counts c JOIN totals t ON t.user_id = c.user_id
)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n, rnk, share
FROM ranked WHERE rnk <= 3
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per user with frequency share, deterministically
    tie-broken. The pre-aggregation bounds rank input to |users| x |types|;
    WindowGroupLimit prunes each partition to 3 rows before the final
    filter."""
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("total", F.sum("n").over(wt))
        .withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            "user_id",
            "event_type",
            "n",
            "rnk",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
    )


@query(
    "scd2_point_in_time",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
    SELECT user_id, event_type AS state, ts, event_id
    FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
), dim AS (
    SELECT user_id, state,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           epoch_us(ts)              AS valid_from_us,
           epoch_us(LEAD(ts) OVER w) AS valid_to_us
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), probes AS (
    SELECT event_id AS probe_id, user_id, epoch_us(ts) AS p_us
    FROM events WHERE event_id % 97 = 0
)
SELECT p.probe_id, p.user_id, p.p_us, d.state, d.version
FROM probes p JOIN dim d
  ON d.user_id = p.user_id
 AND d.valid_from_us <= p.p_us
 AND (d.valid_to_us IS NULL OR p.p_us < d.valid_to_us)
""",
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each probe fact looks up the SCD2
    dimension VERSION that was valid at its event time — the
    training-data-leakage-safe dimension lookup every feature pipeline
    needs (joining `is_current` instead leaks the future). The interval
    predicate rides the user_id equi-join, and versions-per-user is
    bounded, so the range filter inside each key group is linear — no
    quadratic blowup; at 100 TB both sides shuffle once on user_id (or
    none, bucketed). [valid_from, valid_to) semantics make a probe at an
    exact change instant resolve to the NEW version, and zero-length
    versions (same-microsecond flips) match nothing — exactly one match
    per probe, pinned by test."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    dim = changes.select(
        "user_id", "state",
        F.row_number().over(w).cast("int").alias("version"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
    )
    probes = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 97 == 0)
        .select(
            F.col("event_id").alias("probe_id"), "user_id",
            F.unix_micros("ts").alias("p_us"),
        )
    )
    return probes.join(
        dim,
        (dim["user_id"] == probes["user_id"])
        & (dim["valid_from_us"] <= probes["p_us"])
        & (dim["valid_to_us"].isNull() | (probes["p_us"] < dim["valid_to_us"])),
    ).select(
        "probe_id", probes["user_id"], "p_us", "state", "version",
    )


@query(
    "event_transitions",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
), pairs AS (
    SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
), totals AS (
    SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total FROM pairs GROUP BY 1
)
SELECT p.prev_type, p.next_type, p.n, t.row_total,
       ROUND(p.n / t.row_total, 6) AS p_transition
FROM pairs p JOIN totals t USING (prev_type)
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    lag within the user timeline, count (prev, next) pairs, normalize per
    source state — the behavioral-model input product analytics derives
    from clickstreams. One user_id shuffle for the lag; the |types|²
    transition aggregate is map-combinable and tiny; probability is an
    integer ratio rounded at fixed scale (engine-exact, as heavy_hitters'
    share)."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    # row totals as a window over the tiny |types|^2 aggregate — NOT a
    # groupBy + join back, which would re-run the raw-events pass twice
    row_total = F.sum("n").over(Window.partitionBy("prev_type")).cast("long")
    return pairs.select(
        "prev_type", "next_type", "n", row_total.alias("row_total"),
        F.round(F.col("n") / row_total, 6).alias("p_transition"),
    )


@query(
    "attribution_models",
    oracle="""
WITH purchases AS (
    SELECT event_id AS purchase_id, user_id,
           CAST(epoch_us(ts) AS BIGINT) AS p_us,
           ROUND(value, 6) AS amount
    FROM events WHERE event_type = 'purchase'
), touches AS (
    SELECT user_id, event_type AS channel, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS t_us
    FROM events WHERE event_type IN ('view', 'click', 'signup')
), windowed AS (
    SELECT p.purchase_id, p.amount, t.channel, t.t_us, t.event_id
    FROM purchases p
    JOIN touches t ON t.user_id = p.user_id
     AND t.t_us < p.p_us
     AND t.t_us >= p.p_us - CAST(604800000000 AS BIGINT)
), credited AS (
    SELECT purchase_id, amount, channel, t_us, event_id,
           ROW_NUMBER() OVER (PARTITION BY purchase_id
                              ORDER BY t_us, event_id)          AS rn_first,
           ROW_NUMBER() OVER (PARTITION BY purchase_id
                              ORDER BY t_us DESC, event_id DESC) AS rn_last
    FROM windowed
)
SELECT channel,
       CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch_n,
       CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)  AS last_touch_n,
       CAST(SUM(CASE WHEN rn_first = 1
                THEN CAST(amount AS DECIMAL(18,6)) END) AS DOUBLE)   AS first_touch_rev,
       CAST(SUM(CASE WHEN rn_last = 1
                THEN CAST(amount AS DECIMAL(18,6)) END) AS DOUBLE)   AS last_touch_rev
FROM credited GROUP BY channel
""",
)
def q_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution, first-touch vs last-touch side by side: each
    purchase credits the earliest and the latest touch event (view / click
    / signup) in its trailing 7-day window. One interval-predicate join on
    user_id; both credit picks are WindowGroupLimit-prunable row_numbers
    over the SAME purchase partitioning; revenue sums are DECIMAL-exact at
    the value column's rounded scale. Comparing the two models' per-channel
    totals is the standard channel-mix sanity report."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.round("value", 6).alias("amount"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        F.col("user_id").alias("t_user"), F.col("event_type").alias("channel"),
        "event_id", F.unix_micros("ts").alias("t_us"),
    )
    windowed = purchases.join(
        touches,
        (purchases["user_id"] == touches["t_user"])
        & (touches["t_us"] < purchases["p_us"])
        & (touches["t_us"] >= purchases["p_us"] - 7 * 86400 * 1_000_000),
    )
    w_first = Window.partitionBy("purchase_id").orderBy("t_us", "event_id")
    w_last = Window.partitionBy("purchase_id").orderBy(
        F.col("t_us").desc(), F.col("event_id").desc()
    )
    credited = windowed.select(
        "purchase_id", "amount", "channel",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    dec_amount = F.col("amount").cast("decimal(18,6)")
    return credited.groupBy("channel").agg(
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0)).alias("first_touch_n"),
        F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0)).alias("last_touch_n"),
        F.sum(F.when(F.col("rn_first") == 1, dec_amount)).cast("double").alias("first_touch_rev"),
        F.sum(F.when(F.col("rn_last") == 1, dec_amount)).cast("double").alias("last_touch_rev"),
    )


# --- Overlapping-interval merge (gaps and islands) ---------------------------

@query(
    "interval_merge",
    oracle="""
WITH iv AS (
    SELECT user_id, ts AS s,
           ts + to_seconds(CAST(floor(value * 60) AS BIGINT)) AS e
    FROM events
), flagged AS (
    SELECT user_id, s, e,
           CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                THEN 1 ELSE 0 END AS new_island
    FROM iv
), islands AS (
    SELECT user_id, s, e,
           SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       MIN(s) AS island_start, MAX(e) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM islands
GROUP BY user_id, island
""",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge each user's overlapping activity intervals
    (event start, start + value minutes) into maximal islands — the segment
    union behind sessionized billing, on-call coverage, and span dedup.
    Single-pass window form (no self-join): an interval opens a new island
    iff its start exceeds the running MAX(end) of every EARLIER interval
    (rows-preceding frame excludes the current row), then the island id is
    the running sum of those flags and the merge is a plain groupBy. Scale
    shape: one user-keyed sort-window pass + a hash agg — the quadratic
    interval self-join never materializes, and per-task state is two
    scalars (running max / running sum). Fractional-minute arithmetic goes through an explicit floor() to
    integer seconds — DuckDB ROUNDS on double->BIGINT casts while Spark
    truncates, so the floor is load-bearing for cross-engine equality."""
    iv = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_add(
            "SECOND", F.floor(F.col("value") * 60).cast("long"), F.col("ts")
        ).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("e").over(wprev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(wrun).cast("long")
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count("*").cast("long").alias("n_events"),
    )


# --- A/B experiment readout: two-proportion z-test ---------------------------

AB_CONV_VALUE = 90.0   # conversion = any purchase with value above this


@query(
    "ab_test_zscore",
    oracle=f"""
WITH u AS (
    SELECT user_id, user_id % 2 AS variant,
           MAX(CASE WHEN event_type = 'purchase' AND value > {AB_CONV_VALUE}
                    THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY 1, 2
), v AS (
    SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(conv) AS BIGINT) AS c
    FROM u GROUP BY 1
)
SELECT a.n AS n_a, a.c AS conv_a,
       ROUND(a.c / CAST(a.n AS DOUBLE), 8) AS rate_a,
       b.n AS n_b, b.c AS conv_b,
       ROUND(b.c / CAST(b.n AS DOUBLE), 8) AS rate_b,
       ROUND((a.c / CAST(a.n AS DOUBLE) - b.c / CAST(b.n AS DOUBLE))
             / sqrt(((a.c + b.c) / CAST(a.n + b.n AS DOUBLE))
                    * (1.0 - (a.c + b.c) / CAST(a.n + b.n AS DOUBLE))
                    * (1.0 / a.n + 1.0 / b.n)), 8) AS z_score
FROM (SELECT * FROM v WHERE variant = 0) a
CROSS JOIN (SELECT * FROM v WHERE variant = 1) b
""",
)
def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test readout for a deterministic experiment split
    (variant = user_id % 2): per-variant exposure and conversion counts
    (conversion = any purchase worth > {AB_CONV_VALUE}), conversion
    rates, and the pooled z statistic — the experiment-analysis shape an
    events warehouse serves daily.

    Determinism: conversions are exact per-user MAX flags folded into
    exact BIGINT counts; the z expression is a fixed tree of IEEE
    divisions and one correctly-rounded sqrt over those ints, so both
    engines produce the identical double before ROUND 8.

    100-TB shape: one events scan -> per-user flag (map-combinable MAX)
    sharded on user_id -> a 2-row variant aggregate; the final z is a
    broadcast of two single-row sides. Nothing retains per-event state,
    and the user-grain agg is the only shuffle."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("user_id"), (F.col("user_id") % 2).alias("variant")
        )
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > AB_CONV_VALUE),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
    )
    v = u.groupBy("variant").agg(
        F.count("*").cast("long").alias("n"), F.sum("conv").cast("long").alias("c")
    )
    a = v.where(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = v.where(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b")
    pool = (ca + cb) / (F.col("n_a") + F.col("n_b")).cast("double")
    z = (ca / na - cb / nb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "conv_a",
        F.round(ca / na, 8).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(cb / nb, 8).alias("rate_b"),
        F.round(z, 8).alias("z_score"),
    )


# --- Population Stability Index (train/serve feature drift) ------------------

PSI_BINS = 10
PSI_SPLIT_DAY = 15     # slice boundary: day-of-month <= 15 vs > 15
KS_BINS = 20           # binned-KS drift gate: finer than PSI (ECDF sup needs
                       # resolution; PSI's +1 smoothing prefers fat bins)

# nano-nat quantization of ln(p/q) for the PSI oracle (operators/lnq.py)
_PSI_LNU_SQL = ln_units_sql(
    f"((g.c_b + 1) / CAST(t.n_b + {PSI_BINS} AS DOUBLE))"
    f" / ((g.c_c + 1) / CAST(t.n_c + {PSI_BINS} AS DOUBLE))"
)


@query(
    "psi_feature_drift",
    oracle=f"""
WITH ev AS (
    SELECT event_type, value,
           CAST(EXTRACT(day FROM ts) <= {PSI_SPLIT_DAY} AS INTEGER) AS is_base
    FROM events
), rng AS (
    SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
    FROM ev GROUP BY 1
), binned AS (
    SELECT e.event_type, e.is_base,
           LEAST(CAST(FLOOR((e.value - r.lo) / (r.hi - r.lo) * {PSI_BINS})
                      AS BIGINT), {PSI_BINS - 1}) AS bin
    FROM ev e JOIN rng r ON r.event_type = e.event_type
), counts AS (
    SELECT event_type, bin,
           CAST(COUNT(*) FILTER (WHERE is_base = 1) AS BIGINT) AS c_b,
           CAST(COUNT(*) FILTER (WHERE is_base = 0) AS BIGINT) AS c_c
    FROM binned GROUP BY 1, 2
), grid AS (
    SELECT t.event_type, b.bin,
           COALESCE(c.c_b, 0) AS c_b, COALESCE(c.c_c, 0) AS c_c
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) b
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.bin = b.bin
), tots AS (
    SELECT event_type, CAST(SUM(c_b) AS BIGINT) AS n_b,
           CAST(SUM(c_c) AS BIGINT) AS n_c
    FROM grid GROUP BY 1
), terms AS (
    SELECT g.event_type, t.n_b, t.n_c,
           (CAST(g.c_b + 1 AS HUGEINT) * CAST(t.n_c + {PSI_BINS} AS HUGEINT)
                - CAST(g.c_c + 1 AS HUGEINT) * CAST(t.n_b + {PSI_BINS} AS HUGEINT))
             * {_PSI_LNU_SQL} AS prod
    FROM grid g JOIN tots t ON t.event_type = g.event_type
)
SELECT event_type, n_b AS n_base, n_c AS n_current,
       ROUND(CAST(SUM(prod) AS DOUBLE)
             / (CAST(n_b + {PSI_BINS} AS DOUBLE)
                * CAST(n_c + {PSI_BINS} AS DOUBLE))
             / {LN_UNIT_SCALE}.0, 8) AS psi
FROM terms GROUP BY 1, 2, 3
""",
)
def q_psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the month's two
    halves — the train/serve feature-drift gate every scoring pipeline
    monitors (PSI > 0.2 = retrain): {PSI_BINS} equi-width bins over the
    feature's observed range, Laplace-smoothed shares (+1 per bin, so
    empty bins stay finite), PSI = sum (p-q)*ln(p/q). The numeric
    sibling of ``corpus_drift_kl`` (symmetric-ish, binned) and
    ``cusum_drift`` (sequential).

    Determinism (the KL idiom): bin edges are a fixed IEEE tree on
    min/max doubles (identical floor both engines); shares are exact-int
    ratios; the one transcendental is quantized to integer nano-nats
    (operators/lnq.py), and everything downstream is exact integer math:
    (p-q) over the shared denominator (n_b+B)(n_c+B) is an integer
    numerator, so psi = SUM(num*units) / denom / 1e9 with an
    order-independent integer sum and one final bit-identical double
    division+round per group.

    100-TB shape: one scan builds (type, slice, bin) counts
    (map-combinable, bounded key space = |types| x {PSI_BINS} x 2);
    everything after runs on that grid."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.dayofmonth("ts") <= PSI_SPLIT_DAY).cast("int").alias("is_base"),
    )
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = ev.join(F.broadcast(rng), "event_type").select(
        "event_type",
        "is_base",
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * PSI_BINS
            ).cast("long"),
            F.lit(PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("is_base") == 1, 1)).cast("long").alias("c_b"),
        F.count(F.when(F.col("is_base") == 0, 1)).cast("long").alias("c_c"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(PSI_BINS).select(
                    F.col("id").cast("long").alias("bin")
                )
            )
        )
        .join(counts, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce(F.col("c_b"), F.lit(0).cast("long")).alias("c_b"),
            F.coalesce(F.col("c_c"), F.lit(0).cast("long")).alias("c_c"),
        )
    )
    tots = grid.groupBy("event_type").agg(
        F.sum("c_b").cast("long").alias("n_b"),
        F.sum("c_c").cast("long").alias("n_c"),
    )
    p = (F.col("c_b") + 1) / (F.col("n_b") + PSI_BINS).cast("double")
    q = (F.col("c_c") + 1) / (F.col("n_c") + PSI_BINS).cast("double")
    # exact integer numerator of (p - q) over the shared denominator
    # (n_b+B)(n_c+B); the whole per-type sum is then exact integer math.
    # Each OPERAND is widened to decimal(19,0) BEFORE the multiply so the
    # products land in decimal(38,0) — long*long would silently wrap past
    # 2^63 under non-ANSI Spark while DuckDB errors (ADVICE r11 item 2:
    # per-type counts near 3e9 at 100 TB put (c+1)*(n+B) past 9.2e18).
    num = (
        (F.col("c_b") + 1).cast("decimal(19,0)")
        * (F.col("n_c") + PSI_BINS).cast("decimal(19,0)")
        - (F.col("c_c") + 1).cast("decimal(19,0)")
        * (F.col("n_b") + PSI_BINS).cast("decimal(19,0)")
    )
    terms = grid.join(F.broadcast(tots), "event_type").select(
        "event_type",
        "n_b",
        "n_c",
        (num * ln_units(p / q)).alias("prod"),
    )
    return (
        terms.groupBy(
            "event_type",
            F.col("n_b").alias("n_base"),
            F.col("n_c").alias("n_current"),
        )
        .agg(
            F.round(
                F.sum("prod").cast("double")
                / (
                    (F.col("n_base") + PSI_BINS).cast("double")
                    * (F.col("n_current") + PSI_BINS).cast("double")
                )
                / F.lit(LN_UNIT_SCALE_F),
                8,
            ).alias("psi")
        )
    )


# --- Mann-Whitney U (Wilcoxon rank-sum) two-sample test ----------------------

MW_TYPE_1 = "purchase"   # sample 1
MW_TYPE_2 = "view"       # sample 2
MW_BUCKET = 1000         # cents per prefix bucket (value domain is a fixed
                         # metric range, so the bucket count is bounded)


@query(
    "mann_whitney_u",
    oracle=f"""
WITH s AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc,
           CAST(event_type = '{MW_TYPE_1}' AS INTEGER) AS s1
    FROM events
    WHERE event_type IN ('{MW_TYPE_1}', '{MW_TYPE_2}')
), grp AS (
    SELECT vc, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(s1) AS BIGINT) AS n1v
    FROM s GROUP BY 1
), pre AS (
    SELECT vc, cnt, n1v,
           CAST(SUM(cnt) OVER (ORDER BY vc) - cnt AS BIGINT) AS prev
    FROM grp
), agg AS (
    SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
           CAST(SUM(cnt - n1v) AS BIGINT) AS n2,
           CAST(SUM(n1v * (2 * prev + cnt + 1)) AS BIGINT) AS r1x2,
           CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
    FROM pre
)
SELECT n1, n2,
       ROUND((r1x2 - n1 * (n1 + 1)) / 2.0, 2) AS u1,
       ROUND(((r1x2 - n1 * (n1 + 1)) / 2.0
              - CAST(n1 AS DOUBLE) * n2 / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * ((n1 + n2 + 1)
                       - ties / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))),
             8) AS z
FROM agg
""",
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test comparing the
    '{MW_TYPE_1}' vs '{MW_TYPE_2}' event-value distributions — the
    NONPARAMETRIC sibling of ``ab_test_zscore`` (no normality
    assumption), with the normal approximation z including the standard
    tie correction. Rank sums use the tie-group identity: every row in
    a tied value group takes the group's average rank, so
    2*R1 = sum over groups of n1v * (2*prev + cnt + 1) — exact int64,
    no half-ranks until the readout.

    Plan: one scan to value-group grain (vc cents, exact), then a
    prefix-count along the value order. At row grain that prefix would
    be a global sort; at GROUP grain it is a bucketed two-phase prefix
    (the two_phase_rank argument): intra-bucket windows partition by
    the {MW_BUCKET}-cent bucket, bucket totals are a bounded aggregate
    (fixed metric domain). The oracle states the plain one-window form.
    All test statistics derive from four exact int64 sums in one final
    single-row expression (fixed IEEE tree, ROUND 8).

    100-TB shape: shuffles touch only the distinct-value group table;
    the four sufficient statistics are map-combinable."""
    from ..operators.windows import bounded_window

    s = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(MW_TYPE_1, MW_TYPE_2))
        .select(
            F.round(F.col("value") * 100).cast("long").alias("vc"),
            (F.col("event_type") == MW_TYPE_1).cast("int").alias("s1"),
        )
    )
    grp = s.groupBy("vc").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("s1").cast("long").alias("n1v"),
    ).withColumn("bucket", F.floor(F.col("vc") / MW_BUCKET))
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = grp.select(
        "vc",
        "cnt",
        "n1v",
        "bucket",
        (F.sum("cnt").over(w_intra) - F.col("cnt")).alias("prev_in_bucket"),
    )
    btot = grp.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("bc"))
    w_b = bounded_window(
        "bucket",
        bound=f"bucket totals: value domain / {MW_BUCKET} cents, bounded",
        queries=("mann_whitney_u",),
    ).rowsBetween(Window.unboundedPreceding, 0)
    bpre = btot.select(
        "bucket", (F.sum("bc").over(w_b) - F.col("bc")).alias("bucket_prev")
    )
    pre = intra.join(F.broadcast(bpre), "bucket").select(
        "cnt",
        "n1v",
        (F.col("bucket_prev") + F.col("prev_in_bucket")).alias("prev"),
    )
    agg = pre.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1v")).cast("long").alias("n2"),
        F.sum(F.col("n1v") * (2 * F.col("prev") + F.col("cnt") + 1))
        .cast("long")
        .alias("r1x2"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = (F.col("r1x2") - n1 * (n1 + 1)) / 2.0
    mu = n1.cast("double") * n2 / 2.0
    var = (
        n1.cast("double")
        * n2
        / 12.0
        * (
            (n1 + n2 + 1)
            - F.col("ties") / ((n1 + n2).cast("double") * (n1 + n2 - 1))
        )
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 2).alias("u1"),
        F.round((u1 - mu) / F.sqrt(var), 8).alias("z"),
    )


# --- Welch's t-test (unequal-variance two-sample) ----------------------------

WELCH_TYPE_1 = "purchase"
WELCH_TYPE_2 = "view"


@query(
    "welch_t_test",
    oracle=f"""
WITH s AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc,
           CAST(event_type = '{WELCH_TYPE_1}' AS INTEGER) AS s1
    FROM events
    WHERE event_type IN ('{WELCH_TYPE_1}', '{WELCH_TYPE_2}')
), g AS (
    SELECT s1, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(vc) AS BIGINT) AS s,
           CAST(SUM(vc * vc) AS BIGINT) AS q
    FROM s GROUP BY 1
), w AS (
    SELECT
        MAX(CASE WHEN s1 = 1 THEN n END) AS n1,
        MAX(CASE WHEN s1 = 0 THEN n END) AS n2,
        MAX(CASE WHEN s1 = 1 THEN s END) AS s1s,
        MAX(CASE WHEN s1 = 0 THEN s END) AS s2s,
        MAX(CASE WHEN s1 = 1 THEN q END) AS q1,
        MAX(CASE WHEN s1 = 0 THEN q END) AS q2
    FROM g
)
SELECT n1, n2,
       ROUND(s1s / (100.0 * n1), 8) AS mean1,
       ROUND(s2s / (100.0 * n2), 8) AS mean2,
       ROUND((s1s / (100.0 * n1) - s2s / (100.0 * n2))
             / sqrt(((q1 - CAST(s1s AS DOUBLE) * s1s / n1)
                     / (10000.0 * (n1 - 1))) / n1
                    + ((q2 - CAST(s2s AS DOUBLE) * s2s / n2)
                       / (10000.0 * (n2 - 1))) / n2),
             8) AS t,
       ROUND(POW(((q1 - CAST(s1s AS DOUBLE) * s1s / n1)
                  / (10000.0 * (n1 - 1))) / n1
                 + ((q2 - CAST(s2s AS DOUBLE) * s2s / n2)
                    / (10000.0 * (n2 - 1))) / n2, 2)
             / (POW(((q1 - CAST(s1s AS DOUBLE) * s1s / n1)
                     / (10000.0 * (n1 - 1))) / n1, 2) / (n1 - 1)
                + POW(((q2 - CAST(s2s AS DOUBLE) * s2s / n2)
                       / (10000.0 * (n2 - 1))) / n2, 2) / (n2 - 1)),
             4) AS df
FROM w
""",
)
def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on '{WELCH_TYPE_1}' vs
    '{WELCH_TYPE_2}' event values — the PARAMETRIC sibling of
    ``mann_whitney_u`` (compares means, not rank distributions), with
    the Welch-Satterthwaite degrees of freedom.

    Exactness: the only data-dependent aggregation is three int64 sums
    per group (n, sum of cents, sum of squared cents; 49,002 cents max
    -> squares ~2.4e9, x rows ~ 4.8e12 << 2^63). Every mean/variance/
    t/df derives from those six exact integers through one fixed IEEE
    double expression tree, identical in both engines (+, -, *, /,
    sqrt, pow are all correctly rounded), then ROUND 8/4 at readout.

    100-TB shape: one scan, map-combinable partial sums, a 2-row
    exchange; no windows, no joins. The cheapest possible two-sample
    test at any scale."""
    s = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(WELCH_TYPE_1, WELCH_TYPE_2))
        .select(
            F.round(F.col("value") * 100).cast("long").alias("vc"),
            (F.col("event_type") == WELCH_TYPE_1).cast("int").alias("s1"),
        )
    )
    g = s.groupBy("s1").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vc").cast("long").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("q"),
    )
    w = g.agg(
        F.max(F.when(F.col("s1") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("s1") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("s1") == 1, F.col("s"))).alias("s1s"),
        F.max(F.when(F.col("s1") == 0, F.col("s"))).alias("s2s"),
        F.max(F.when(F.col("s1") == 1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("s1") == 0, F.col("q"))).alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1s") / (100.0 * n1)
    m2 = F.col("s2s") / (100.0 * n2)
    v1 = (F.col("q1") - F.col("s1s").cast("double") * F.col("s1s") / n1) / (
        10000.0 * (n1 - 1)
    )
    v2 = (F.col("q2") - F.col("s2s").cast("double") * F.col("s2s") / n2) / (
        10000.0 * (n2 - 1)
    )
    se2 = v1 / n1 + v2 / n2
    df_ws = F.pow(se2, 2) / (
        F.pow(v1 / n1, 2) / (n1 - 1) + F.pow(v2 / n2, 2) / (n2 - 1)
    )
    return w.select(
        "n1",
        "n2",
        F.round(m1, 8).alias("mean1"),
        F.round(m2, 8).alias("mean2"),
        F.round((m1 - m2) / F.sqrt(se2), 8).alias("t"),
        F.round(df_ws, 4).alias("df"),
    )


# --- Kruskal-Wallis H (k-group rank test) ------------------------------------

KW_BUCKET = 1000  # cents per prefix bucket (same bounded-domain argument
                  # as MW_BUCKET)


@query(
    "kruskal_wallis",
    oracle=f"""
WITH s AS (
    SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS vc
    FROM events
), vg AS (
    SELECT vc, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY 1
), pre AS (
    SELECT vc, cnt,
           CAST(SUM(cnt) OVER (ORDER BY vc) - cnt AS BIGINT) AS prev
    FROM vg
), gv AS (
    SELECT g, s.vc, CAST(COUNT(*) AS BIGINT) AS cnt_gv
    FROM s GROUP BY 1, 2
), grp AS (
    SELECT g, CAST(SUM(cnt_gv) AS BIGINT) AS n_g,
           CAST(SUM(cnt_gv * (2 * pre.prev + pre.cnt + 1)) AS BIGINT)
               AS r2x
    FROM gv JOIN pre ON gv.vc = pre.vc
    GROUP BY 1
), tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS nn,
           CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
    FROM vg
), uv AS (
    SELECT n_g, r2x // (4 * n_g) AS u, r2x % (4 * n_g) AS v
    FROM grp
), hsum AS (
    SELECT CAST(SUM(u * u * (4 * n_g) + 2 * u * v
                    + (v * v) // (4 * n_g)) AS BIGINT) AS hq,
           SUM(CAST((v * v) % (4 * n_g) AS DOUBLE) / (4 * n_g)) AS hfrac
    FROM uv
)
SELECT g AS event_type, n_g, r2x AS rank_sum_x2,
       ROUND(
           (12.0 / (nn * CAST(nn + 1 AS DOUBLE)) * (hq + hfrac)
            - 3.0 * (nn + 1))
           / (1.0 - ties / (CAST(nn AS DOUBLE) * nn * nn - nn)),
           8) AS h
FROM grp, tot, hsum
""",
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test across ALL event-type groups — the k-group
    generalization of ``mann_whitney_u`` (one-way ANOVA on ranks), with
    the standard tie correction. Emits one row per group carrying the
    exact per-group evidence (n_g, doubled tie-averaged rank sum) plus
    the global H repeated per row.

    Exactness: doubled rank sums are exact int64 via the tie-group
    identity (2*R_g = sum_v cnt_gv * (2*prev_v + cnt_v + 1)); the
    H numerator sum_g (2R_g)^2 / n_g is split by divmod into an exact
    integer part plus k sub-1.0 double fractions. (2R_g)^2 itself would
    overflow int64 past ~100k rows, so each term is expanded through
    r2x = u*D + v (D = 4*n_g): r2x^2 div D = u^2*D + 2uv + v^2 div D
    with every piece <= N^2*n_g — long-safe to ~1e9 rows, decimal(38,0)
    beyond (documented escalation, same expression tree). Cross-engine /
    combine-order drift lives only in the k sub-1.0 fractions — a few
    ulps, invisible under ROUND 8 against H's ~1e4 magnitude.

    Plan: value-group grain + the same bucketed two-phase prefix as
    ``mann_whitney_u`` (intra-bucket window over {KW_BUCKET}-cent
    buckets, bounded bucket-total broadcast); per-(group,value) counts
    join the prefix at value grain; everything after is a k-row
    aggregate. 100-TB: two map-combinable shuffles at value grain,
    no row-grain sort anywhere."""
    from ..operators.windows import bounded_window

    s = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    vg = s.groupBy("vc").agg(F.count("*").cast("long").alias("cnt"))
    vgb = vg.withColumn("bucket", F.floor(F.col("vc") / KW_BUCKET))
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = vgb.select(
        "vc",
        "cnt",
        "bucket",
        (F.sum("cnt").over(w_intra) - F.col("cnt")).alias("prev_in_bucket"),
    )
    btot = vgb.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("bc"))
    w_b = bounded_window(
        "bucket",
        bound=f"bucket totals: value domain / {KW_BUCKET} cents, bounded",
        queries=("kruskal_wallis",),
    ).rowsBetween(Window.unboundedPreceding, 0)
    bpre = btot.select(
        "bucket", (F.sum("bc").over(w_b) - F.col("bc")).alias("bucket_prev")
    )
    pre = intra.join(F.broadcast(bpre), "bucket").select(
        "vc",
        "cnt",
        (F.col("bucket_prev") + F.col("prev_in_bucket")).alias("prev"),
    )
    gv = s.groupBy("g", "vc").agg(F.count("*").cast("long").alias("cnt_gv"))
    grp = (
        gv.join(pre, "vc")
        .groupBy("g")
        .agg(
            F.sum("cnt_gv").cast("long").alias("n_g"),
            F.sum(
                F.col("cnt_gv") * (2 * F.col("prev") + F.col("cnt") + 1)
            )
            .cast("long")
            .alias("r2x"),
        )
    )
    tot = vg.agg(
        F.sum("cnt").cast("long").alias("nn"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("ties"),
    )
    uv = grp.select(
        "n_g",
        F.expr("r2x div (4 * n_g)").alias("u"),
        (F.col("r2x") % (4 * F.col("n_g"))).alias("v"),
    )
    hsum = uv.agg(
        F.sum(
            F.col("u") * F.col("u") * (4 * F.col("n_g"))
            + 2 * F.col("u") * F.col("v")
            + F.expr("(v * v) div (4 * n_g)")
        )
        .cast("long")
        .alias("hq"),
        F.sum(
            ((F.col("v") * F.col("v")) % (4 * F.col("n_g"))).cast("double")
            / (4 * F.col("n_g"))
        ).alias("hfrac"),
    )
    nn = F.col("nn")
    h_raw = 12.0 / (nn * (nn + 1).cast("double")) * (
        F.col("hq") + F.col("hfrac")
    ) - 3.0 * (nn + 1)
    corr = 1.0 - F.col("ties") / (
        nn.cast("double") * nn * nn - nn
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(hsum))
        .select(
            F.col("g").alias("event_type"),
            "n_g",
            F.col("r2x").alias("rank_sum_x2"),
            F.round(h_raw / corr, 8).alias("h"),
        )
    )


# --- Markov removal-effect attribution ----------------------------------------

MK_CHANNELS = ("click", "signup", "view")   # transient touch states (sorted:
                                            # term ORDER is part of the
                                            # cross-engine contract)
MK_ITERS = 16   # fixed-point rounds of p = M p + c; with positive absorption
                # the map is a contraction, so 16 rounds pin far more digits
                # than the ROUND-10 readout keeps. Both engines evaluate the
                # IDENTICAL expression tree (same term order, left-assoc),
                # so no per-round rounding is needed for hash equality.


def _mk_matrix_exprs() -> list[str]:
    """SQL select-list for the one-row chain matrix from ``trans``
    (prev, next, n). Term order and coalesce placement are mirrored by
    the Spark builder below — keep in lockstep."""
    out = []
    for s in MK_CHANNELS:
        tot = f"SUM(CASE WHEN prev = '{s}' THEN n END)"
        for t in MK_CHANNELS:
            out.append(
                f"COALESCE(SUM(CASE WHEN prev = '{s}' AND next = '{t}'"
                f" THEN n END) / CAST({tot} AS DOUBLE), 0.0) AS m_{s}_{t}"
            )
        out.append(
            f"COALESCE(SUM(CASE WHEN prev = '{s}' AND next = 'CONV'"
            f" THEN n END) / CAST({tot} AS DOUBLE), 0.0) AS conv_{s}"
        )
    stot = "SUM(CASE WHEN prev = 'START' THEN n END)"
    for t in MK_CHANNELS:
        out.append(
            f"COALESCE(SUM(CASE WHEN prev = 'START' AND next = '{t}'"
            f" THEN n END) / CAST({stot} AS DOUBLE), 0.0) AS start_{t}"
        )
    out.append(
        f"COALESCE(SUM(CASE WHEN prev = 'START' AND next = 'CONV'"
        f" THEN n END) / CAST({stot} AS DOUBLE), 0.0) AS start_conv"
    )
    return out


def _mk_carry() -> list[str]:
    return (
        [f"m_{s}_{t}" for s in MK_CHANNELS for t in MK_CHANNELS]
        + [f"conv_{s}" for s in MK_CHANNELS]
        + [f"start_{s}" for s in MK_CHANNELS]
        + ["start_conv"]
    )


def _mk_p_exprs(k_prev_has_p: bool) -> list[tuple[str, str]]:
    """(alias, formula) per iterated value: base chain p_<ch> and
    removal chains p_<ch>_x<r> (state r pinned to 0)."""
    out = []
    for ch in MK_CHANNELS:
        if k_prev_has_p:
            dot = " + ".join(f"m_{ch}_{t} * p_{t}" for t in MK_CHANNELS)
            out.append((f"p_{ch}", f"{dot} + conv_{ch}"))
        else:
            out.append((f"p_{ch}", f"conv_{ch} * 0.0"))
        for r in MK_CHANNELS:
            if r == ch:
                continue
            if k_prev_has_p:
                dot = " + ".join(
                    f"m_{ch}_{t} * p_{t}_x{r}"
                    for t in MK_CHANNELS
                    if t != r
                )
                out.append((f"p_{ch}_x{r}", f"{dot} + conv_{ch}"))
            else:
                out.append((f"p_{ch}_x{r}", f"conv_{ch} * 0.0"))
    return out


def _mk_iteration_ctes() -> str:
    ctes = [
        "it0 AS (SELECT m.*, "
        + ", ".join(f"{f} AS {a}" for a, f in _mk_p_exprs(False))
        + " FROM m)"
    ]
    for k in range(MK_ITERS):
        sel = _mk_carry() + [
            f"({f}) AS {a}" for a, f in _mk_p_exprs(True)
        ]
        ctes.append(f"it{k + 1} AS (SELECT {', '.join(sel)} FROM it{k})")
    return ",\n".join(ctes)


def _mk_readout_rows() -> str:
    base = (
        " + ".join(f"start_{s} * p_{s}" for s in MK_CHANNELS)
        + " + start_conv"
    )
    rows = []
    for r in MK_CHANNELS:
        rem = (
            " + ".join(
                f"start_{s} * p_{s}_x{r}" for s in MK_CHANNELS if s != r
            )
            + " + start_conv"
        )
        rows.append(
            f"SELECT '{r}' AS channel, {base} AS base_p,"
            f" {rem} AS removal_p FROM it{MK_ITERS}"
        )
    return " UNION ALL ".join(rows)


_MK_JOURNEY_SQL = f"""
users AS (
    SELECT DISTINCT user_id FROM events
), fp AS (
    SELECT user_id, p_us, p_eid FROM (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS p_us,
               event_id AS p_eid,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
), touch AS (
    SELECT e.user_id, e.event_type AS channel,
           CAST(epoch_us(e.ts) AS BIGINT) AS t_us, e.event_id,
           (fp.user_id IS NOT NULL) AS converted
    FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
    WHERE e.event_type IN {MK_CHANNELS!r}
      AND (fp.user_id IS NULL
           OR (CAST(epoch_us(e.ts) AS BIGINT), e.event_id)
              < (fp.p_us, fp.p_eid))
), seq AS (
    SELECT user_id, channel, converted,
           LAG(channel) OVER w AS prev_ch,
           ROW_NUMBER() OVER w AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n_t
    FROM touch
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
), trans AS (
    SELECT 'START' AS prev, channel AS next, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE rn = 1 GROUP BY 2
    UNION ALL
    SELECT prev_ch, channel, CAST(COUNT(*) AS BIGINT)
    FROM seq WHERE prev_ch IS NOT NULL GROUP BY 1, 2
    UNION ALL
    SELECT channel, CASE WHEN converted THEN 'CONV' ELSE 'NULL' END,
           CAST(COUNT(*) AS BIGINT)
    FROM seq WHERE rn = n_t GROUP BY 1, 2
    UNION ALL
    SELECT 'START', CASE WHEN fp.user_id IS NOT NULL
                         THEN 'CONV' ELSE 'NULL' END,
           CAST(COUNT(*) AS BIGINT)
    FROM users u
    LEFT JOIN (SELECT DISTINCT user_id FROM touch) t
           ON t.user_id = u.user_id
    LEFT JOIN fp ON fp.user_id = u.user_id
    WHERE t.user_id IS NULL GROUP BY 2
)
"""


@query(
    "markov_attribution",
    oracle="WITH " + _MK_JOURNEY_SQL + f"""
, m AS (
    SELECT {", ".join(_mk_matrix_exprs())} FROM trans
),
{_mk_iteration_ctes()}
, ro AS (
    {_mk_readout_rows()}
), tot AS (
    SELECT SUM(base_p - removal_p) AS re_sum FROM ro
)
SELECT channel,
       ROUND(base_p, 10) AS base_conv_p,
       ROUND(removal_p, 10) AS removal_conv_p,
       ROUND((base_p - removal_p) / base_p, 10) AS removal_effect,
       ROUND((base_p - removal_p) / re_sum, 10) AS attribution_share
FROM ro, tot
""",
)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    model next to ``attribution_models``' rule-based first/last touch:
    per-user journeys (touches before the first purchase) define a
    first-order chain over {MK_CHANNELS} with absorbing CONV/NULL;
    a channel's credit is how much the chain's conversion probability
    drops when that state is removed (pinned to 0 — journeys through it
    fail), normalized across channels (Anderl et al. 2014's framework).

    Conversion probability solves p = M p + c; both engines iterate the
    identical {MK_ITERS}-round fixed-point expression (term order pinned
    by MK_CHANNELS — the SQL text and the Spark expressions are
    generated from the SAME lists), every matrix entry is ONE
    correctly-rounded integer-ratio division, so the chains agree
    bit-for-bit and ROUND 10 at readout is cosmetic. Removal chains
    reuse the base matrix with the removed state's value pinned — no
    re-extraction, 3 extra value vectors riding the same iteration.

    100-TB shape: one user_id shuffle builds journeys (lag + boundary
    rows); the transition table is |states|^2-bounded; the entire
    fixed-point solve is a ONE-ROW expression chain (map-only, no
    driver loop, no per-iteration shuffle)."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.col("event_id").alias("p_eid"),
    )
    w_fp = Window.partitionBy("user_id").orderBy("p_us", "p_eid")
    fp = (
        purchases.withColumn("rn", F.row_number().over(w_fp))
        .where(F.col("rn") == 1)
        .select("user_id", "p_us", "p_eid")
    )
    touch = (
        ev.where(F.col("event_type").isin(*MK_CHANNELS))
        .select(
            "user_id",
            F.col("event_type").alias("channel"),
            F.unix_micros("ts").alias("t_us"),
            "event_id",
        )
        .join(fp, "user_id", "left")
        .where(
            F.col("p_us").isNull()
            | (F.col("t_us") < F.col("p_us"))
            | (
                (F.col("t_us") == F.col("p_us"))
                & (F.col("event_id") < F.col("p_eid"))
            )
        )
        .select(
            "user_id",
            "channel",
            "t_us",
            "event_id",
            F.col("p_us").isNotNull().alias("converted"),
        )
    )
    w_seq = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    w_cnt = Window.partitionBy("user_id")
    seq = touch.select(
        "user_id",
        "channel",
        "converted",
        F.lag("channel").over(w_seq).alias("prev_ch"),
        F.row_number().over(w_seq).alias("rn"),
        F.count("*").over(w_cnt).alias("n_t"),
    )
    # r16 single-pass transition extraction (guide §1.2 remove-work,
    # §2.4 remove shuffles): the three seq-derived groupings (start /
    # mid / end edges) each re-ran the whole journey pipeline — ev scan,
    # fp window, touch join, both windows — as separate union branches
    # (the before-plan shows the subtree 3x). Every row instead emits its
    # edge(s) map-side: (coalesce(prev_ch,'START'), channel) — prev_ch is
    # NULL exactly on rn=1, so this IS t_start + t_mid — plus the
    # absorbing (channel, CONV/NULL) edge on the last touch. The matrix
    # aggregate's conditional SUMs are grouping-insensitive (SUM(CASE
    # WHEN prev=s AND next=t THEN n END) over any row split of the same
    # multiset is the same long), so the edges feed m with n=1 directly —
    # no (prev, next) groupBy exchange at all, the partial aggregation
    # reduces each task to the <= (|channels|+2)^2 matrix cells.
    step_edge = F.struct(
        F.coalesce(F.col("prev_ch"), F.lit("START")).alias("prev"),
        F.col("channel").alias("next"),
    )
    end_edge = F.struct(
        F.col("channel").alias("prev"),
        F.when(F.col("converted"), "CONV").otherwise("NULL").alias("next"),
    )
    edges = seq.select(
        F.explode(
            F.when(
                F.col("rn") == F.col("n_t"), F.array(step_edge, end_edge)
            ).otherwise(F.array(step_edge))
        ).alias("e")
    ).select(
        F.col("e.prev").alias("prev"),
        F.col("e.next").alias("next"),
        F.lit(1).cast("long").alias("n"),
    )
    users = ev.select("user_id").distinct()
    no_touch = (
        users.join(touch.select("user_id").distinct(), "user_id", "left_anti")
        .join(fp.select("user_id", F.lit(1).alias("__c")), "user_id", "left")
        .select(
            F.lit("START").alias("prev"),
            F.when(F.col("__c").isNotNull(), "CONV").otherwise("NULL").alias(
                "next"
            ),
            F.lit(1).cast("long").alias("n"),
        )
    )
    trans = edges.unionByName(no_touch)
    m = trans.agg(
        *[F.expr(e) for e in _mk_matrix_exprs()]
    )
    it = m.selectExpr("*", *[f"{f} AS {a}" for a, f in _mk_p_exprs(False)])
    for _ in range(MK_ITERS):
        it = it.selectExpr(
            *_mk_carry(), *[f"({f}) AS {a}" for a, f in _mk_p_exprs(True)]
        )
    base = (
        " + ".join(f"start_{s} * p_{s}" for s in MK_CHANNELS) + " + start_conv"
    )
    arms = []
    rems = []
    for r in MK_CHANNELS:
        rem = (
            " + ".join(
                f"start_{s} * p_{s}_x{r}" for s in MK_CHANNELS if s != r
            )
            + " + start_conv"
        )
        rems.append(rem)
        arms.append(
            f"struct('{r}' AS channel, {base} AS base_p, {rem} AS removal_p)"
        )
    # r16: re_sum is computed IN the one-row frame before the explode
    # instead of `ro.agg(sum(base_p - removal_p))` + crossJoin — the agg
    # branch re-ran the ENTIRE journey/matrix/iteration chain a second
    # time (the before-plan is two symmetric copies of the whole plan).
    # Bit-exactness: F.sum over the 3 exploded rows of the single-row
    # partition folds ((0.0 + x_1) + x_2) + x_3 in channel order, and
    # 0.0 + x == x exactly (x_r = base - rem_r is never -0.0: IEEE a-a
    # with equal finite operands is +0.0), so the left-associated SQL
    # sum below reproduces the aggregate's fold bit-for-bit.
    re_sum = " + ".join(
        f"(({base}) - ({rem}))" for rem in rems
    )
    ro = it.selectExpr(
        f"explode(array({', '.join(arms)})) AS r",
        f"({re_sum}) AS re_sum",
    ).select("r.channel", "r.base_p", "r.removal_p", "re_sum")
    return ro.select(
        "channel",
        F.round("base_p", 10).alias("base_conv_p"),
        F.round("removal_p", 10).alias("removal_conv_p"),
        F.round(
            (F.col("base_p") - F.col("removal_p")) / F.col("base_p"), 10
        ).alias("removal_effect"),
        F.round(
            (F.col("base_p") - F.col("removal_p")) / F.col("re_sum"), 10
        ).alias("attribution_share"),
    )


# --- Kolmogorov-Smirnov two-sample test (exact integer argmax) ----------------

KS_TYPE_1 = "purchase"
KS_TYPE_2 = "view"
KS_BUCKET = 1000   # cents per prefix bucket (bounded metric domain, as MW)


@query(
    "ks_test",
    oracle=f"""
WITH s AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc,
           CAST(event_type = '{KS_TYPE_1}' AS INTEGER) AS s1
    FROM events
    WHERE event_type IN ('{KS_TYPE_1}', '{KS_TYPE_2}')
), grp AS (
    SELECT vc, CAST(SUM(s1) AS BIGINT) AS c1v,
           CAST(SUM(1 - s1) AS BIGINT) AS c2v
    FROM s GROUP BY 1
), pre AS (
    SELECT vc,
           CAST(SUM(c1v) OVER (ORDER BY vc) AS BIGINT) AS c1,
           CAST(SUM(c2v) OVER (ORDER BY vc) AS BIGINT) AS c2
    FROM grp
), tot AS (
    SELECT CAST(SUM(c1v) AS BIGINT) AS n1, CAST(SUM(c2v) AS BIGINT) AS n2
    FROM grp
), arg AS (
    SELECT vc, ABS(c1 * n2 - c2 * n1) AS num, n1, n2
    FROM pre, tot
    QUALIFY ROW_NUMBER() OVER (ORDER BY ABS(c1 * n2 - c2 * n1) DESC, vc)
            = 1
)
SELECT n1, n2, vc AS d_at_cents,
       ROUND(num / (CAST(n1 AS DOUBLE) * n2), 10) AS d_stat,
       ROUND(num / (CAST(n1 AS DOUBLE) * n2)
             * SQRT(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 8) AS ks_lambda
FROM arg
""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test ('{KS_TYPE_1}' vs
    '{KS_TYPE_2}' value distributions): D = sup_x |F1(x) - F2(x)| —
    the distribution-DRIFT test that sees shape changes
    ``welch_t_test`` (means) and ``mann_whitney_u`` (location shift)
    cannot. The supremum is computed as an EXACT INTEGER argmax:
    |F1 - F2| at a value group equals |c1*n2 - c2*n1| / (n1*n2), and
    the numerator is exact int64 (c <= 1e6 counts x 1e6 sample sizes is
    long-safe to ~3e9 rows per side; decimal beyond) — so the engines
    agree on BOTH the max and its location with zero float involvement;
    the two divisions happen once at readout. Also reports the value
    (cents) where the gap peaks and the asymptotic lambda =
    D*sqrt(n1*n2/(n1+n2)).

    Plan: value-group grain, the MW-style bucketed two-phase prefix for
    both CDFs in one pass, then a TakeOrdered(1) on the bounded
    value-group table. 100-TB: shuffles only distinct values; the
    statistic is one row."""
    from ..operators.windows import bounded_window

    s = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(KS_TYPE_1, KS_TYPE_2))
        .select(
            F.round(F.col("value") * 100).cast("long").alias("vc"),
            (F.col("event_type") == KS_TYPE_1).cast("int").alias("s1"),
        )
    )
    grp = s.groupBy("vc").agg(
        F.sum("s1").cast("long").alias("c1v"),
        F.sum(1 - F.col("s1")).cast("long").alias("c2v"),
    ).withColumn("bucket", F.floor(F.col("vc") / KS_BUCKET))
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = grp.select(
        "vc",
        "bucket",
        F.sum("c1v").over(w_intra).alias("i1"),
        F.sum("c2v").over(w_intra).alias("i2"),
    )
    btot = grp.groupBy("bucket").agg(
        F.sum("c1v").cast("long").alias("b1"),
        F.sum("c2v").cast("long").alias("b2"),
    )
    w_b = bounded_window(
        "bucket",
        bound=f"bucket totals: value domain / {KS_BUCKET} cents, bounded",
        queries=("ks_test",),
    ).rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select(
        "bucket",
        F.coalesce(F.sum("b1").over(w_b), F.lit(0)).alias("p1"),
        F.coalesce(F.sum("b2").over(w_b), F.lit(0)).alias("p2"),
    )
    pre = intra.join(F.broadcast(bpre), "bucket").select(
        "vc",
        (F.col("p1") + F.col("i1")).cast("long").alias("c1"),
        (F.col("p2") + F.col("i2")).cast("long").alias("c2"),
    )
    tot = grp.agg(
        F.sum("c1v").cast("long").alias("n1"),
        F.sum("c2v").cast("long").alias("n2"),
    )
    num = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    arg = (
        pre.crossJoin(F.broadcast(tot))
        .orderBy(num.desc(), F.col("vc"))
        .limit(1)
    )
    n1d = F.col("n1").cast("double")
    d = num / (n1d * F.col("n2"))
    return arg.select(
        "n1",
        "n2",
        F.col("vc").alias("d_at_cents"),
        F.round(d, 10).alias("d_stat"),
        F.round(
            d * F.sqrt(n1d * F.col("n2") / (F.col("n1") + F.col("n2"))), 8
        ).alias("ks_lambda"),
    )
