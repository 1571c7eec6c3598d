"""The trade simulator — SURVEY.md W6 (forward-window first-match) x J6
(strategy-grid cross join), the reference's hard core
(/root/reference/daily_function.py:717-816).

Reference semantics preserved exactly:
- buy signal: strict crossover ``prev open_cci < thr AND open_cci > thr``
  (daily_function.py:724-725); buy at that row's open price/date (:735-737).
- forward window: the next ``x`` rows by position, not days (:739).
- target hit: first future row with ``close_pr >= buy_price*(1+r/100)``;
  stop hit: first future row with ``close_cci <= stop_thr`` (:745-751).
- precedence (:754): target wins only if strictly earlier than stop; equal
  index -> stop_loss. No hit -> maturity at the min(x, len(future))-th row.
- ``days_held``: calendar days for target/stop; the CONSTANT ``x`` for
  maturity even when the series ends early (:796) — preserved as-is.
- a buy on the last row (empty forward window) produces no trade (:741-742).

Spark-first plan (SURVEY section 4.2 Plan A, chosen over the range self-join):
1. one window pass per symbol builds ``future`` = collect_list(struct) over
   ROWS BETWEEN 1 FOLLOWING AND x_max FOLLOWING — O(x_max) per row, computed
   in the same sort as the lag/crossover, so ONE shuffle on symbol serves
   the whole simulator;
2. crossover filter runs immediately after the window projection, so the
   dense non-buy rows never leave the stage (the "push the sparse filter
   below the crossJoin" rewrite, SURVEY section 4.3);
3. per buy row, first-hit indexes for every target_return and stop_thr are
   computed ONCE via array HOFs (``array_position`` over a transformed
   bounded array), then the (holding x return x stop) grid expansion is a
   broadcast cross join doing pure integer lookups — the 4,860-way blow-up
   multiplies scalars, not array scans.

At 100 TB: everything after the single symbol-shuffle is map-local; the grid
is a broadcast literal; the only later shuffle is the strategy aggregation's
groupBy. Skewed symbols (long histories) are bounded by x_max-sized state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .literals import literal_table
from ..schemas import (
    GRID_BUY_THRESHOLD,
    GRID_HOLDING_DAYS,
    GRID_STOP_THRESHOLD,
    GRID_TARGET_RETURN,
)


DEFAULT_GRID = {
    "holding_days": GRID_HOLDING_DAYS,
    "target_return": GRID_TARGET_RETURN,
    "buy_threshold": GRID_BUY_THRESHOLD,
    "stop_threshold": GRID_STOP_THRESHOLD,
}


def _first_index(arr: Column, pred) -> Column:
    """1-based index of the first element satisfying ``pred``; null if none.
    ``array_position(transform(arr, pred), true)`` stays in Catalyst; Spark
    returns 0 for not-found, normalized to null (DuckDB's list_position
    returns NULL directly)."""
    return F.nullif(F.array_position(F.transform(arr, pred), F.lit(True)), F.lit(0)).cast("int")


def with_search_years(cci: DataFrame, years: list) -> DataFrame:
    """The reference's search-history depth dimension (daily_function.py:
    670-682, 704-705): for each depth y the per-symbol CCI frame is filtered
    to ``date >= max(date) - y years`` (``'all'`` = no filter), and every
    downstream stage is keyed by the depth. CCI values are computed on the
    FULL history first and then row-filtered — exactly the reference's
    update-then-filter order — so indicator values at the window edge still
    see pre-boundary history, while the crossover lag (computed downstream
    per (symbol, search_years) partition) restarts inside the slice, nulling
    the slice's first row like pandas' post-filter iteration does.

    Shape: per-symbol max date is a tiny aggregate broadcast back into the
    fact side, and the depth table is a broadcast literal — the expansion is
    map-local; the one real shuffle stays the simulator's downstream
    (symbol, search_years) window sort. add_months clamps Feb-29 the same
    way pd.DateOffset(years=...) and DuckDB month intervals do."""
    spark = cci.sparkSession
    yrs = literal_table(
        spark,
        [(str(y), None if y == "all" else int(y)) for y in years],
        "search_years STRING, __n_years INT",
    )
    maxd = cci.groupBy("symbol").agg(F.max("date").alias("__max_d"))
    return (
        cci.join(F.broadcast(maxd), "symbol")
        .crossJoin(F.broadcast(yrs))
        .filter(
            F.col("__n_years").isNull()
            | (F.col("date") >= F.add_months("__max_d", -12 * F.col("__n_years")))
        )
        .drop("__max_d", "__n_years")
    )


def simulate_trades(
    cci: DataFrame,
    grid: dict | None = None,
    extra_keys: tuple[str, ...] = (),
    years: list | None = None,
) -> DataFrame:
    """cci (symbol, date, open_pr, close_pr, open_cci, close_cci, ...) ->
    one row per (buy event x grid combo), TRADE_SCHEMA-shaped. ``extra_keys``
    (e.g. search_years) join symbol as partition keys for every window and
    are carried through to the output.

    ``years`` (the reference's search-history depths, daily_function.py:
    670-682) activates the single-pass depth plan: instead of replaying the
    window pipeline once per depth over ``with_search_years``-expanded rows
    (the round-2 shape — k x the collect_list pass for k depths), the
    simulator runs ONCE on the full history and derives each depth by
    filtering the sparse buy rows against a broadcast per-(symbol, depth)
    boundary table. Equivalence to the replay (pinned by
    tests/test_search_years.py::test_fast_depth_plan_matches_replay):
    - the depth slice keeps rows ``date >= max(date) - y years``; a sliced
      lag restarts, so the slice's FIRST row has prev_cci = NULL and can
      never be a buy -> drop full-history buys at ``buy_date <= first
      slice date``; every later slice row sees the same prev row as the
      full history, so its crossover flag is unchanged, and NULL < thr is
      false-ish in both engines so the slice can't ADD buys;
    - the forward window only looks toward max(date), entirely inside the
      slice, so t_idx/s_idx/maturity rows are identical.
    At 100 TB this turns the depth dimension from a k-x multiplier on the
    heavy symbol-shuffle into a broadcast-joined filter over buy events."""
    grid = grid or DEFAULT_GRID
    x_max = max(grid["holding_days"])
    if years is not None:
        # the depth-boundary table (maxd/bounds below) is computed per
        # symbol only, so a finer grain would get wrong boundaries
        assert extra_keys == (), "years-mode computes boundaries per symbol"
    part_cols = ["symbol", *extra_keys]
    w = Window.partitionBy(*part_cols).orderBy("date")
    fw = w.rowsBetween(1, x_max)

    base = cci.select(
        *part_cols,
        "date",
        "open_pr",
        "open_cci",
        F.lag("open_cci", 1).over(w).alias("prev_cci"),
        F.collect_list(F.struct("date", "close_pr", "close_cci")).over(fw).alias("future"),
    )

    buy_thr = F.explode(F.array(*[F.lit(float(b)) for b in grid["buy_threshold"]])).alias(
        "condition_buy_cci_threshold"
    )
    buys = (
        base.select("*", buy_thr)
        .filter(
            (F.col("prev_cci") < F.col("condition_buy_cci_threshold"))
            & (F.col("open_cci") > F.col("condition_buy_cci_threshold"))
            & (F.size("future") >= 1)
        )
        .select(
            *part_cols,
            F.col("date").alias("buy_date"),
            F.col("open_pr").alias("buy_price"),
            "condition_buy_cci_threshold",
            "future",
        )
    )

    # First-hit indexes for every target return / stop threshold, computed
    # once per buy row over the bounded future array.
    r_grid = grid["target_return"]
    s_grid = grid["stop_threshold"]

    # NB: single-parameter closures — a 2-parameter lambda would be treated
    # by the HOF binder as the (element, index) form.
    def target_pred(r: int):
        return lambda f: f["close_pr"] >= F.col("buy_price") * (1 + F.lit(r) / 100.0)

    def stop_pred(s: float):
        return lambda f: f["close_cci"] <= F.lit(float(s))

    buys = buys.withColumns({
        "t_idx": F.array(*[_first_index(F.col("future"), target_pred(r)) for r in r_grid]),
        "s_idx": F.array(*[_first_index(F.col("future"), stop_pred(s)) for s in s_grid]),
        "flen": F.size("future"),
    })

    # Pre-extract every sell-row field the grid can reference — the target
    # row per r, the stop row per s, the maturity row per x — BEFORE the
    # grid expansion, then drop ``future``. The crossJoin then multiplies
    # ~|r|+|s|+|x| scalars per buy row instead of materializing the x_max-
    # struct future array once per combo (measured: carrying the 60-struct
    # array through the 81-way expansion dominated the whole simulator).
    # element_at(arr, NULL) is NULL, so missing hits propagate unchanged.
    def row_at(idx: Column):
        return F.element_at(F.col("future"), idx)

    x_grid = grid["holding_days"]
    buys = buys.withColumns({
        "t_dates": F.transform("t_idx", lambda i: row_at(i)["date"]),
        "t_prices": F.transform("t_idx", lambda i: row_at(i)["close_pr"]),
        "s_dates": F.transform("s_idx", lambda i: row_at(i)["date"]),
        "s_prices": F.transform("s_idx", lambda i: row_at(i)["close_pr"]),
        "m_dates": F.array(*[row_at(F.least(F.lit(x), F.col("flen")))["date"] for x in x_grid]),
        "m_prices": F.array(*[row_at(F.least(F.lit(x), F.col("flen")))["close_pr"] for x in x_grid]),
    }).drop("future")

    if years is not None:
        # Per-(symbol, depth) slice boundary: first date inside the slice.
        # |symbols| x |depths| rows — broadcast. Buys are kept for a depth
        # when they fall strictly after its boundary ("all" keeps every buy:
        # the full-history lag already nulled the true first row).
        spark = cci.sparkSession
        yrs = literal_table(
            spark,
            [(str(y), None if y == "all" else int(y)) for y in years],
            "search_years STRING, __n_years INT",
        )
        maxd = cci.groupBy("symbol").agg(F.max("date").alias("__max_d"))
        bounds = (
            cci.select("symbol", "date")
            .join(F.broadcast(maxd), "symbol")
            .crossJoin(F.broadcast(yrs))
            .groupBy("symbol", "search_years")
            .agg(
                F.min(
                    F.when(
                        F.col("__n_years").isNotNull()
                        & (F.col("date") >= F.add_months("__max_d", -12 * F.col("__n_years"))),
                        F.col("date"),
                    )
                ).alias("__first_d"),
                F.first(F.col("__n_years").isNull()).alias("__is_all"),
            )
        )
        buys = buys.join(F.broadcast(bounds), "symbol").filter(
            F.col("__is_all") | (F.col("buy_date") > F.col("__first_d"))
        ).drop("__first_d", "__is_all")
        part_cols = ["symbol", "search_years", *extra_keys]

    # Broadcast grid expansion: (holding, return, stop) with the positions of
    # holding/return/stop inside the precomputed per-buy-row arrays.
    combos = literal_table(
        buys.sparkSession,
        [
            (x, xi + 1, r, ri + 1, float(s), si + 1)
            for xi, x in enumerate(x_grid)
            for ri, r in enumerate(r_grid)
            for si, s in enumerate(s_grid)
        ],
        "condition_holding_days INT, x_pos INT, condition_target_return INT, r_pos INT, "
        "condition_stop_loss_cci_threshold DOUBLE, s_pos INT",
    )
    e = buys.crossJoin(F.broadcast(combos))

    x = F.col("condition_holding_days")
    t0 = F.element_at("t_idx", F.col("r_pos"))
    s0 = F.element_at("s_idx", F.col("s_pos"))
    e = e.withColumns({
        "t_hit": F.when(t0 <= x, t0),
        "s_hit": F.when(s0 <= x, s0),
    })
    is_target = F.col("t_hit").isNotNull() & (
        F.col("s_hit").isNull() | (F.col("t_hit") < F.col("s_hit"))
    )
    is_stop = ~is_target & F.col("s_hit").isNotNull()

    e = e.withColumns({
        "trade_result": F.when(is_target, "reach_target")
        .when(is_stop, "stop_loss")
        .otherwise("maturity"),
        "reach_target_date": F.when(is_target, F.element_at("t_dates", F.col("r_pos"))),
        "reach_target_price": F.when(is_target, F.element_at("t_prices", F.col("r_pos"))),
        "stop_loss_date": F.when(is_stop, F.element_at("s_dates", F.col("s_pos"))),
        "stop_loss_price": F.when(is_stop, F.element_at("s_prices", F.col("s_pos"))),
        "maturity_date": F.when(~is_target & ~is_stop, F.element_at("m_dates", F.col("x_pos"))),
        "maturity_price": F.when(~is_target & ~is_stop, F.element_at("m_prices", F.col("x_pos"))),
    })
    # P11 coalesce (daily_function.py:1019-1027) + days_held (:767, :787, :796)
    e = e.withColumns({
        "sell_date": F.coalesce("reach_target_date", "stop_loss_date", "maturity_date"),
        "sell_price": F.coalesce("reach_target_price", "stop_loss_price", "maturity_price"),
    })
    e = e.withColumn(
        "days_held",
        F.when(F.col("trade_result") == "maturity", x).otherwise(
            F.datediff("sell_date", "buy_date")
        ).cast("int"),
    )
    return e.select(
        *part_cols, "buy_date", "buy_price",
        "condition_holding_days", "condition_target_return",
        "condition_buy_cci_threshold", "condition_stop_loss_cci_threshold",
        "reach_target_date", "reach_target_price",
        "stop_loss_date", "stop_loss_price",
        "maturity_date", "maturity_price",
        "sell_date", "sell_price", "days_held", "trade_result",
    )


def aggregate_strategies(trades: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """A1/A2 (daily_function.py:1047-1071): per (symbol x condition) outcome
    aggregation + derived rate measures. ``extra_keys`` (e.g. search_years,
    daily_function.py:1041-1042) extend the group key.

    Determinism notes vs the reference: rates are emitted as exact per-row
    divisions of integer/decimal-exact aggregates instead of pandas
    ``round(x, 2)`` (half-boundary rounding is engine-dependent; the values
    differ from the reference only in the 3rd+ decimal). total_revenue is the
    unrounded difference of the rounded totals (reference rounds to 0
    decimals, daily_function.py:1069)."""
    gcols = [
        "symbol",
        *extra_keys,
        "condition_holding_days",
        "condition_target_return",
        "condition_buy_cci_threshold",
        "condition_stop_loss_cci_threshold",
    ]
    win = F.col("sell_price") > F.col("buy_price")
    lose = F.col("sell_price") < F.col("buy_price")
    # revenue-per-day quantized to 1e-8 by EXACT INTEGER math (r9): the
    # price diff is exactly 4 decimals, so D = round(diff*1e4) is an
    # exact int64 and the unit is floor(D*1e4/days + 0.5) — IEEE-safe
    # (|D*1e4| <= ~1e13, division error < 1e-3 vs >= 1/(2*days) = 8e-3
    # boundary distance; exact midpoints are dyadic rationals the
    # division returns exactly, ties rounding toward +inf in every
    # engine's floor). The previous form rounded the DOUBLE quotient to
    # 8 decimals — Java BigDecimal(shortest-repr) HALF_UP vs DuckDB's
    # multiply-based ROUND disagree by one 1e-8 unit on knife-edge
    # quotients (one trade at sf0.1, symbol 753, flipped the whole
    # strategy_agg/best_* family; caught by the r9 sf0.1 sweep).
    rev_diff_units = F.round(
        (F.col("sell_price") - F.col("buy_price")) * 1e4
    ).cast("long")
    rpd_unit = F.floor(
        rev_diff_units * F.lit(10000) / F.col("days_held") + F.lit(0.5)
    ).cast("long")

    # Scale note: a naive 4x countDistinct here makes Spark expand every
    # trade row 5x before the shuffle (billions of rows at the full 4,860
    # grid), and the round-1 alternative (3 null-filtered collect_sets)
    # forces ObjectHashAggregate — no Tungsten codegen, measured 2.5x
    # super-linear at 5x data and 12.9s at sf0.1. The scale-safe shape is a
    # TWO-PHASE codegen hash agg:
    #   phase 1 groups at (group keys, trade_result, sell_date) — every
    #     measure is decomposable (sums/counts), and the grain rows ARE the
    #     distinct (outcome, sell_date) pairs, so the pandas .nunique
    #     semantics (reference daily_function.py:1047-1061) fall out as a
    #     plain row count in phase 2. sell_date is never null (the simulator
    #     coalesces target/stop/maturity, and flen >= 1), matching
    #     COUNT(DISTINCT ...)'s null-dropping. Map-side partial aggregation
    #     collapses the 4,860-way grid expansion before the shuffle.
    #   phase 2 re-groups the tiny grain table (<= trades' distinct
    #     sell-date count per combo) on the group keys alone.
    # Both phases are plain HashAggregate inside WholeStageCodegen; buy_date
    # is unique within a group (one trade per buy event per combo), so
    # count_buy_date == sum of grain counts.
    tag = F.col("trade_result")
    grain = trades.groupBy(*gcols, "trade_result", "sell_date").agg(
        F.count("*").alias("__n"),
        F.sum(win.cast("long")).alias("__n_win"),
        F.sum(lose.cast("long")).alias("__n_lose"),
        # money/ratio sums fold EXACT scaled-int64 units (buy=open_pr is
        # 4-dec exact, sell=close_pr 2-dec exact, rev_per_day rounded at 8
        # — sources/prices.py contract; the per-row round only strips <<1
        # ulp of double representation error). Integer addition is
        # associative, so the totals are ORDER-INDEPENDENT and
        # bit-identical across the two-phase fold here, the fused Arrow
        # kernel's int64 sums, and the oracle's decimal SUM — equality no
        # longer depends on a post-sum ROUND absorbing double-summation
        # order drift (round-7 hardening, ADVICE r5/r6). Long sums keep
        # both hash-agg phases in Tungsten codegen (a decimal(38,8)
        # accumulator measured +2.2 s on strategy_agg at sf0.1); the
        # int64 budget is ~9.2e18 vs ~1e17 worst-case unit totals.
        F.sum(rpd_unit).alias("__sum_rpd"),
        F.sum("days_held").alias("__sum_days"),
        F.sum(F.round(F.col("buy_price") * 1e4, 0).cast("long")).alias("__sum_buy"),
        F.sum(F.round(F.col("sell_price") * 1e2, 0).cast("long")).alias("__sum_sell"),
    )

    def n_outcome_dates(t: str) -> Column:
        return F.sum((tag == t).cast("long"))

    agged = grain.groupBy(*gcols).agg(
        F.sum("__n").alias("count_buy_date"),
        n_outcome_dates("reach_target").alias("count_reach_target_date"),
        n_outcome_dates("stop_loss").alias("count_stop_loss_date"),
        n_outcome_dates("maturity").alias("count_maturity_date"),
        F.sum("__n_win").alias("count_win"),
        F.sum("__n_lose").alias("count_lose"),
        # unscale through DECIMAL division, not a double divide: the unit
        # total can exceed 2^53, where fl(S)/1e8 double-rounds; the decimal
        # quotient is exact (scale >= the unit scale) and its double cast
        # is correctly rounded — bit-equal to the oracle's decimal route.
        # The dividend is cast to decimal(28,0), NOT (38,0): at p1=38 the
        # quotient precision overflows 38 and Spark's precision-loss rule
        # truncates the scale to 6 — silently rounding the 8-dec ratio
        # sum. p1=28 keeps the full max(6, p2+1)-digit scale exactly.
        (F.sum("__sum_rpd").cast("decimal(28,0)")
         / F.lit(100_000_000).cast("decimal(9,0)"))
        .cast("double").alias("sum_revenue_per_days_held"),
        F.sum("__sum_days").cast("long").alias("sum_days_held"),
        F.sum("__n").alias("count_trades"),
        (F.sum("__sum_buy").cast("decimal(28,0)")
         / F.lit(10_000).cast("decimal(5,0)"))
        .cast("double").alias("total_buy_price"),
        (F.sum("__sum_sell").cast("decimal(28,0)")
         / F.lit(100).cast("decimal(3,0)"))
        .cast("double").alias("total_sell_price"),
    )
    return agged.withColumns({
        "avg_revenue_per_days_held": F.col("sum_revenue_per_days_held") / F.col("count_trades"),
        "avg_days_held": F.col("sum_days_held") / F.col("count_trades"),
        "win_rate": F.lit(100.0) * F.col("count_win") / F.col("count_buy_date"),
        "lose_rate": F.lit(100.0) * F.col("count_lose") / F.col("count_buy_date"),
        "total_revenue": F.col("total_sell_price") - F.col("total_buy_price"),
        "revenue_rate": (F.col("total_sell_price") - F.col("total_buy_price"))
        / F.col("total_buy_price") * 100.0,
        "reach_target_date_count_per_buy_date_count": F.lit(100.0)
        * F.col("count_reach_target_date") / F.col("count_buy_date"),
        "stop_loss_date_count_per_buy_date_count": F.lit(100.0)
        * F.col("count_stop_loss_date") / F.col("count_buy_date"),
        "maturity_date_count_per_buy_date_count": F.lit(100.0)
        * F.col("count_maturity_date") / F.col("count_buy_date"),
    })


def best_by(agged: DataFrame, metric: str, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """A7 (daily_function.py:1078-1080): argmax condition per symbol (and
    per search depth when ``extra_keys`` carries one — the reference's best
    tables are keyed (symbol, search_years), :1072-1100).

    pandas ``idxmax`` keeps the first occurrence in grid iteration order
    (groupby sorts keys ascending), so the deterministic tie-break is the
    ascending condition tuple — identical selection semantics."""
    w = Window.partitionBy("symbol", *extra_keys).orderBy(
        F.desc(metric),
        F.asc("condition_holding_days"),
        F.asc("condition_target_return"),
        F.asc("condition_buy_cci_threshold"),
        F.asc("condition_stop_loss_cci_threshold"),
    )
    return (
        agged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
