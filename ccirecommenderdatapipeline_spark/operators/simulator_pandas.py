"""Plan B of the trade simulator (SURVEY.md §4.2): a fused per-symbol
``applyInPandas`` that simulates AND aggregates the full strategy grid in
vectorized numpy, emitting only the 4,860 aggregate rows per symbol.

Why it exists: Plan A (operators/simulator.py) is pure Catalyst and
oracle-verified, but its strategy aggregation carries three collect_set
buffers (distinct outcome-date counts) — an ObjectHashAggregate that cannot
run in Tungsten codegen and dominates the full-grid wall clock (~3x the cost
of producing the 467M trade rows themselves at sf0.1). Plan B never
materializes trade rows at all: the grid expansion, outcome resolution and
aggregation happen inside one Arrow batch per symbol, so the shuffle moves
6,000 price rows + 4,860 result rows per symbol instead of ~470k trade rows.

Semantics are identical to Plan A (same crossover strictness, precedence,
maturity days_held constant, rounding points); tests/test_simulator.py
asserts equality on the oracle grids, and since round 7 the money/ratio
totals fold as exact scaled int64 (order-independent), so the equality is
FULL-PRECISION — bit-identical to Plan A's unit sums and the oracle's
decimal SUM, with no dependence on summation order
(tests/test_search_years.py::test_fused_years_matches_plan_a); the
int64→double unscaling is correctly rounded at ANY magnitude via
``_unscale_exact`` (Fraction fallback past 2**53, ADVICE r7 —
tests/test_simulator.py::test_unscale_exact_past_2_53).
Distinct-date counts use np.unique — exact, like collect_set.

At 100 TB: grouped-map state is one symbol's history (~6k rows) — bounded;
skew is capped by max history length, and the Python stage scales with
executors like any map stage. This is the documented exception where the
built-in operators genuinely lose to an Arrow-vectorized kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .simulator import DEFAULT_GRID

AGG_SCHEMA = (
    "symbol STRING, condition_holding_days INT, condition_target_return INT, "
    "condition_buy_cci_threshold DOUBLE, condition_stop_loss_cci_threshold DOUBLE, "
    "count_buy_date BIGINT, count_reach_target_date BIGINT, "
    "count_stop_loss_date BIGINT, count_maturity_date BIGINT, "
    "count_win BIGINT, count_lose BIGINT, "
    "sum_revenue_per_days_held DOUBLE, sum_days_held BIGINT, count_trades BIGINT, "
    "total_buy_price DOUBLE, total_sell_price DOUBLE, "
    "avg_revenue_per_days_held DOUBLE, avg_days_held DOUBLE, "
    "win_rate DOUBLE, lose_rate DOUBLE, total_revenue DOUBLE, revenue_rate DOUBLE, "
    "reach_target_date_count_per_buy_date_count DOUBLE, "
    "stop_loss_date_count_per_buy_date_count DOUBLE, "
    "maturity_date_count_per_buy_date_count DOUBLE"
)

# years-mode output: search_years keys the aggregates alongside symbol
AGG_SCHEMA_YEARS = AGG_SCHEMA.replace(
    "symbol STRING, ", "symbol STRING, search_years STRING, ", 1
)


def _build_unscale_exact():
    """Factory so ``_unscale_exact``'s qualname is NOT importable: the
    applyInPandas kernel below references it, and cloudpickle serializes
    an importable module-level function by REFERENCE — which would make
    every Python worker import this repo (the driver smoke runs from a
    foreign cwd with no such path; ``_first_hits`` is nested for the same
    reason). A closure-built function pickles BY VALUE, shipping the code
    with the kernel."""

    def _unscale_exact(units, scale: int):
        """Correctly-rounded ``units / scale`` for exact int64 decimal
        units.

        ``float64(units) / scale`` rounds once (i.e. is correctly
        rounded) only while ``|units| < 2**53`` — beyond that the
        int64→double conversion itself rounds, and the quotient
        double-rounds (ADVICE r7). Per-symbol unit totals can reach
        ~1e17 at the stated per-trade bounds, only ~1.5x under 2**53, so
        the fast path is guarded: any element at or past 2**53 is
        recomputed through ``Fraction`` (exact rational → one correctly
        rounded conversion). Keeps Plan B bit-identical to Plan A's
        exact decimal division (plans/simulator.py unit-sum CASTs) at
        ANY magnitude, not just under 2**53."""
        arr = np.asarray(units, dtype=np.int64)
        out = arr.astype(np.float64) / scale
        big = np.abs(arr) >= 2**53
        if big.any():
            from fractions import Fraction

            flat, oflat = arr.ravel(), out.ravel()
            for i in np.flatnonzero(big.ravel()):
                oflat[i] = float(Fraction(int(flat[i]), scale))
            out = oflat.reshape(arr.shape)
        return float(out) if np.isscalar(units) or arr.shape == () else out

    return _unscale_exact


_unscale_exact = _build_unscale_exact()


def simulate_aggregate_pandas(
    cci: DataFrame, grid: dict | None = None, years: list | None = None
) -> DataFrame:
    """cci -> per (symbol x full combo) strategy aggregates, one Arrow
    round-trip per symbol.

    ``years`` (the reference's search-history depths) adds the
    (symbol, search_years) grain with ZERO extra window passes: the whole
    symbol history is already inside the Arrow batch, so each depth's slice
    boundary (first date >= max(date) - y years, matching Plan A's
    broadcast boundary table and pd.DateOffset == add_months month-clamp
    semantics) is computed locally, and a depth's aggregates are masked
    sums over the per-buy outcome grid that is computed ONCE for the full
    history — the same buys-only-filter equivalence argument as
    operators/simulator.py's single-pass depth plan (pinned by
    tests/test_search_years.py)."""
    grid = grid or DEFAULT_GRID
    depths = (
        None
        if years is None
        else [(str(y), None if y == "all" else int(y)) for y in years]
    )
    schema = AGG_SCHEMA if depths is None else AGG_SCHEMA_YEARS
    holding = [int(x) for x in grid["holding_days"]]
    returns = [int(r) for r in grid["target_return"]]
    buy_thr = [float(b) for b in grid["buy_threshold"]]
    stop_thr = [float(s) for s in grid["stop_threshold"]]
    x_max = max(holding)

    H, R, S = len(holding), len(returns), len(stop_thr)
    n_combos = H * R * S
    x_arr = np.array(holding)[:, None, None, None]           # (H,1,1,1)
    combo_idx = np.arange(n_combos)
    # condition columns in (x, r, s) nested order, repeated per buy threshold
    cond_x = np.repeat(holding, R * S)
    cond_r = np.tile(np.repeat(returns, S), H)
    cond_s = np.tile(stop_thr, H * R)

    # NB: every helper the grouped-map closure touches is defined INSIDE it
    # (or is a captured plain value / importable third-party module): a
    # reference to a function of THIS package would make cloudpickle
    # serialize the closure by module reference, and executor Python workers
    # launched from a foreign cwd (the driver contract) cannot import it.
    def _first_hits(vals, buy_idx, cmp_ge, thresholds):
        """Per buy index i and threshold t: 1-based position of the first j
        in (i, i+x_max] with vals[j] >= t (or <= t), 0 if none."""
        n = len(vals)
        padded = np.full(n + x_max, np.nan)
        padded[:n] = vals
        win = np.lib.stride_tricks.sliding_window_view(padded, x_max)[buy_idx + 1]
        out = np.zeros((len(buy_idx), len(thresholds)), dtype=np.int64)
        for k, t in enumerate(thresholds):
            m = (win >= t[:, None]) if cmp_ge else (win <= t)
            first = m.argmax(axis=1)
            out[:, k] = np.where(m.any(axis=1), first + 1, 0)
        return out

    def per_symbol(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date").reset_index(drop=True)
        open_cci = pdf["open_cci"].to_numpy(dtype=float)
        close_cci = pdf["close_cci"].to_numpy(dtype=float)
        open_pr = pdf["open_pr"].to_numpy(dtype=float)
        close_pr = pdf["close_pr"].to_numpy(dtype=float)
        date_days = (
            pd.to_datetime(pdf["date"]).to_numpy().astype("datetime64[D]").astype("int64")
        )
        n = len(pdf)
        symbol = pdf["symbol"].iloc[0]
        prev = np.concatenate(([np.nan], open_cci[:-1]))

        # Per-depth slice boundary: first in-slice day (epoch days). A buy
        # survives depth y iff buy day > first-slice day (strictly after:
        # the slice's first row restarts the lag, so it can never buy) —
        # identical to Plan A's broadcast bounds filter. None = keep all.
        if depths is None:
            depth_bounds: list[tuple] = [(None, None)]
        else:
            max_ts = pd.Timestamp(np.datetime64(int(date_days[-1]), "D"))
            depth_bounds = []
            for label, ny in depths:
                if ny is None:
                    depth_bounds.append((label, None))
                else:
                    bday = int(
                        (max_ts - pd.DateOffset(months=12 * ny))
                        .to_datetime64()
                        .astype("datetime64[D]")
                        .astype("int64")
                    )
                    depth_bounds.append(
                        (label, int(date_days[date_days >= bday].min()))
                    )

        frames: list[pd.DataFrame] = []
        for b in buy_thr:
            with np.errstate(invalid="ignore"):
                sig = (prev < b) & (open_cci > b)
            buy_idx = np.flatnonzero(sig)
            buy_idx = buy_idx[buy_idx + 1 < n]  # empty forward window -> no trade
            k = len(buy_idx)
            if k == 0:
                continue  # Plan A emits no group for zero-trade combos
            bp = open_pr[buy_idx]
            flen = np.minimum(n - 1 - buy_idx, x_max)
            targets = bp[None, :] * (1 + np.array(returns)[:, None] / 100.0)
            t_first = _first_hits(close_pr, buy_idx, True,
                                  [targets[ri] for ri in range(R)])
            s_first = _first_hits(close_cci, buy_idx, False, stop_thr)

            # broadcast the whole (H,R,S,k) grid at once
            t0 = t_first.T[None, :, None, :]                 # (1,R,1,k)
            s0 = s_first.T[None, None, :, :]                 # (1,1,S,k)
            t_hit = np.where((t0 > 0) & (t0 <= x_arr), t0, 0)
            s_hit = np.where((s0 > 0) & (s0 <= x_arr), s0, 0)
            is_t = (t_hit > 0) & ((s_hit == 0) | (t_hit < s_hit))
            is_s = ~is_t & (s_hit > 0)
            is_m = ~is_t & ~is_s
            m_pos = np.minimum(x_arr, flen[None, None, None, :])
            sell_pos = np.where(is_t, t_hit, np.where(is_s, s_hit, m_pos))
            abs_pos = buy_idx[None, None, None, :] + sell_pos
            sell_price = close_pr[abs_pos]
            days = np.where(
                is_m,
                np.broadcast_to(x_arr, is_m.shape),
                date_days[abs_pos] - date_days[buy_idx][None, None, None, :],
            )
            # Scale the per-trade money/ratio grids to exact int64 ONCE per
            # buy threshold (outside the depth loop): buy=4-dec, sell=2-dec —
            # the np.round only strips <<1 ulp of double representation
            # error, so these are the exact decimal integers.
            bp_units = np.round(bp * 1e4).astype(np.int64)
            sp_units = np.round(sell_price * 1e2).astype(np.int64)
            # revenue-per-day 1e-8 units by EXACT INTEGER math (r9, same
            # rule as operators/simulator.py and the oracle): the 4dp
            # price diff scaled to int64, floor(D*1e4/days + 0.5).
            # np.round of the double quotient used banker's rounding —
            # a third tie convention next to Java HALF_UP and DuckDB's
            # half-away — and knife-edge quotients flipped one unit.
            d_units = np.round((sell_price - bp) * 1e4).astype(np.int64)
            rpd_units = np.floor(
                d_units * 10000 / days + 0.5
            ).astype(np.int64)

            bdays = date_days[buy_idx]
            for label, fsd in depth_bounds:
                sel = np.ones(k, dtype=bool) if fsd is None else (bdays > fsd)
                k_d = int(sel.sum())
                if k_d == 0:
                    continue  # Plan A emits no group for zero-buy depths
                bp_d = bp[sel]
                sp = sell_price[..., sel]
                ap = abs_pos[..., sel]
                m_t, m_s = is_t[..., sel], is_s[..., sel]
                m_m = is_m[..., sel]

                # Money/ratio totals fold the pre-scaled int64 grids —
                # integer addition is order-independent, so the totals are
                # bit-identical to Plan A's exact decimal sums and the
                # oracle's decimal SUM, with no pairwise-vs-sequential
                # drift for a post-sum ROUND to absorb (round-7 hardening,
                # ADVICE r5/r6). Unscaling goes through _unscale_exact so
                # the int→double step stays correctly rounded even past
                # 2**53 unit totals (round-8 hardening, ADVICE r7).
                tb = _unscale_exact(int(bp_units[sel].sum()), 10**4)
                ts = _unscale_exact(
                    sp_units[..., sel].sum(axis=3), 10**2
                ).reshape(-1)
                cw = (sp > bp_d).sum(axis=3).reshape(-1)
                cl = (sp < bp_d).sum(axis=3).reshape(-1)
                srpd = _unscale_exact(
                    rpd_units[..., sel].sum(axis=3), 10**8
                ).reshape(-1)
                sdh = days[..., sel].sum(axis=3).reshape(-1)

                # distinct sell-date counts per (combo, outcome): one
                # np.unique per outcome over (combo * n + date_pos) codes
                def distinct_counts(mask: np.ndarray) -> np.ndarray:
                    codes = (combo_idx.reshape(H, R, S, 1) * n + ap)[mask]
                    return np.bincount(np.unique(codes) // n, minlength=n_combos)

                c_t = distinct_counts(m_t)
                c_s = distinct_counts(m_s)
                c_m = distinct_counts(m_m)

                out_cols = {
                    "symbol": symbol,
                    "condition_holding_days": cond_x,
                    "condition_target_return": cond_r,
                    "condition_buy_cci_threshold": b,
                    "condition_stop_loss_cci_threshold": cond_s,
                    "count_buy_date": k_d,
                    "count_reach_target_date": c_t,
                    "count_stop_loss_date": c_s,
                    "count_maturity_date": c_m,
                    "count_win": cw,
                    "count_lose": cl,
                    "sum_revenue_per_days_held": srpd,
                    "sum_days_held": sdh,
                    "count_trades": k_d,
                    "total_buy_price": tb,
                    "total_sell_price": ts,
                    "avg_revenue_per_days_held": srpd / k_d,
                    "avg_days_held": sdh / k_d,
                    "win_rate": 100.0 * cw / k_d,
                    "lose_rate": 100.0 * cl / k_d,
                    "total_revenue": ts - tb,
                    "revenue_rate": (ts - tb) / tb * 100.0,
                    "reach_target_date_count_per_buy_date_count": 100.0 * c_t / k_d,
                    "stop_loss_date_count_per_buy_date_count": 100.0 * c_s / k_d,
                    "maturity_date_count_per_buy_date_count": 100.0 * c_m / k_d,
                }
                if label is not None:
                    out_cols["search_years"] = label
                frames.append(pd.DataFrame(out_cols))
        cols = [f.strip().split(" ")[0] for f in schema.split(",")]
        if not frames:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(frames, ignore_index=True)[cols]

    src = cci.select("symbol", "date", "open_pr", "close_pr", "open_cci", "close_cci")
    return src.groupBy("symbol").applyInPandas(per_symbol, schema)
