"""EOD returns transforms — operators #1-9 of SURVEY.md §2.1.

Parity targets: /root/reference/ffn_polars/expr/eod/returns.py (semantics
re-derived, not translated). Series operators compile to explicit
``Window.partitionBy(...).orderBy(...)`` specs; scalar operators are
aggregate Columns usable inside ``groupBy().agg(...)`` and take the time
column explicitly (order-free ``max(struct(ts, v))`` first/last so results
are deterministic under shuffles).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ffn_polars_spark.core import (
    ColumnOrName,
    Over,
    epoch_seconds,
    first_by,
    last_by,
    last_by_if,
    safe_div,
    to_col,
)
from ffn_polars_spark.config import SECONDS_PER_YEAR
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="eod", context="series")
@auto_alias("returns")
@guard_input("self", expected_dtype="double")
def to_returns(self: ColumnOrName, *, over: Over) -> Column:
    """Simple arithmetic returns of a price series: ``p_t / p_{t-1} - 1``.

    First row of each partition is null (lag of the first row).
    Reference: expr/eod/returns.py:11-21.
    """
    w = over.w_ordered("to_returns")
    return safe_div(to_col(self), F.lag(self, 1).over(w)) - 1


@register(namespace="eod", context="series")
@auto_alias("log_returns")
@guard_input("self", expected_dtype="double")
def to_log_returns(self: ColumnOrName, *, over: Over) -> Column:
    """Log returns: ``ln(p_t / p_{t-1})``. Reference: expr/eod/returns.py:24-34."""
    w = over.w_ordered("to_log_returns")
    return F.log(safe_div(to_col(self), F.lag(self, 1).over(w)))


@register(namespace="eod", context="scalar")
@auto_alias("total_return")
@guard_input("self", expected_dtype="double")
def calc_total_return(self: ColumnOrName, ts: ColumnOrName) -> Column:
    """Total return ``last/first - 1`` as a groupBy-agg Column.

    ``ts`` orders the series (the reference reads implicit row order,
    expr/eod/returns.py:152-161).
    """
    return safe_div(last_by(self, ts), first_by(self, ts)) - 1


@register(namespace="eod", context="scalar")
@auto_alias("cagr")
@guard_input("self", expected_dtype="double")
def calc_cagr(self: ColumnOrName, date_col: ColumnOrName) -> Column:
    """Compound annual growth rate: ``(last/first)^(1/year_frac) - 1``.

    Reference: expr/eod/returns.py:92-104 (which composes year_frac,
    expr/eod/temporal.py:153-163 — 365.25-day years).
    """
    date_col = to_col(date_col)
    secs = epoch_seconds(date_col)
    # floor: the reference's year_frac truncates the span to whole seconds
    # (Duration.total_seconds), and calc_cagr composes it (returns.py:104).
    yf = F.floor(F.max(secs) - F.min(secs)) / F.lit(SECONDS_PER_YEAR)
    return (
        F.pow(
            safe_div(last_by(self, date_col), first_by(self, date_col)),
            safe_div(F.lit(1.0), yf),
        )
        - 1
    )


@register(namespace="eod", context="elementwise")
@auto_alias("excess")
@guard_input("self", expected_dtype="double")
def to_excess_returns(self: ColumnOrName, rf: Union[float, str], n: Optional[int] = None) -> Column:
    """Excess returns over a risk-free rate.

    float ``rf``: annualized rate, deannualized over ``n`` periods
    (``r - ((1+rf)^(1/n) - 1)``); str ``rf``: per-period column subtracted
    directly. Reference: expr/eod/returns.py:107-123 (incl. the TypeError
    contract asserted by tests/expr/test_expr_core.py:214-217).
    """
    if isinstance(rf, float):
        if rf == 0:
            return to_col(self)
        return self - (F.pow(F.lit(1.0 + rf), F.lit(1.0) / F.lit(float(n))) - 1)
    elif isinstance(rf, str):
        return self - F.col(rf)
    else:
        raise TypeError("rf must be either a float or a column name string")


@register(namespace="eod", context="series")
@auto_alias("price_index")
@guard_input("self", expected_dtype="double", required_substring="returns")
def to_price_index(self: ColumnOrName, start: float = 100, *, over: Over) -> Column:
    """Price index from arithmetic returns: ``cumprod(1 + r) * start``.

    Nulls count as 0 returns (reference fill_null, expr/eod/returns.py:137).
    Implemented with the native ``product`` window aggregate over a running
    ROWS frame — exact for negative/zero factors (unlike exp-sum-log) and
    stays inside whole-stage codegen.
    """
    w = over.w_cum("to_price_index")
    return F.product(F.coalesce(to_col(self), F.lit(0.0)) + 1).over(w) * F.lit(float(start))


@register(namespace="eod", context="series")
@auto_alias("rebased")
@guard_input("self", expected_dtype="double")
def rebase(self: ColumnOrName, value: float = 100, *, over: Over) -> Column:
    """Rebase a price series to a given start value: ``p / p_first * value``.

    Reference: expr/eod/returns.py:140-149. NULL when the first price is
    0 (a price-contract violation, but the bare division throws an ANSI
    DIVIDE_BY_ZERO instead of degrading — r13 audit).
    """
    w = over.w_cum("rebase")
    first = F.first(self).over(w)
    return F.when(first != 0.0, to_col(self) / first * F.lit(float(value)))


# ---------------------------------------------------------------------------
# MTD / YTD — conditional first/last against the group's latest month / year.
# The condition references a group-level aggregate (latest date), which SQL
# cannot nest inside another aggregate, so MTD is two-phase (one window + one
# agg over the same keys — Spark reuses the exchange, so it is a single
# shuffle). YTD folds into ONE aggregate via the ordered-struct trick because
# year(max(date)) == max(year(date)).
# ---------------------------------------------------------------------------


@register(namespace="eod", context="scalar")
@auto_alias("ytd")
@guard_input("self", expected_dtype="double")
@guard_input("date_col", expected_dtype="timestamp")
def calc_ytd(self: ColumnOrName, date_col: ColumnOrName = "Date") -> Column:
    """Year-to-date return: last price / first price of the latest calendar
    year − 1. Reference: expr/eod/returns.py:66-89.

    Single aggregate: the row with max ``(year, epoch)`` is the latest price;
    the row with max ``(year, -epoch)`` is the first price of the latest year.
    """
    d = to_col(date_col)
    y = F.year(d)
    e = epoch_seconds(d)
    latest = F.max(F.struct(y.alias("y"), e.alias("e"), to_col(self).alias("v"))).getField("v")
    first_of_year = F.max(
        F.struct(y.alias("y"), (-e).alias("e"), to_col(self).alias("v"))
    ).getField("v")
    return safe_div(latest, first_of_year) - 1


def calc_mtd_agg(
    price: ColumnOrName, date_col: ColumnOrName, latest_date: Column
) -> Column:
    """Aggregate half of MTD given a pre-computed group-level ``latest_date``
    column (e.g. ``F.max(date).over(Window.partitionBy(keys))``).

    MTD = last price / last price with (month, year) != latest's − 1
    (reference: expr/eod/returns.py:37-63).
    """
    d = to_col(date_col)
    cond = (F.month(d) != F.month(latest_date)) | (F.year(d) != F.year(latest_date))
    return safe_div(last_by(price, d), last_by_if(cond, price, d)) - 1


@register(namespace="eod", context="dataframe")
def calc_mtd(
    df: DataFrame,
    price: str,
    date_col: str = "Date",
    by: Optional[list] = None,
) -> DataFrame:
    """Month-to-date return per group: latest price over the last price from
    the previous month − 1. Reference: expr/eod/returns.py:37-63.

    Two-phase: a whole-partition window computes the group's latest date, then
    a conditional ordered-struct aggregate picks the reference price. Window
    and groupBy hash on the same keys so only one shuffle occurs.
    """
    from pyspark.sql import Window

    by = list(by or [])
    w = Window.partitionBy(*[F.col(k) for k in by])
    latest = F.max(F.col(date_col)).over(w)
    out = f"{price}_mtd"
    pre = df.withColumn("__latest_date", latest)
    agg = calc_mtd_agg(F.col(price), F.col(date_col), F.col("__latest_date")).alias(out)
    if by:
        return pre.groupBy(*by).agg(agg)
    return pre.groupBy().agg(agg)


calc_mtd._alias_suffix = "mtd"


@register(namespace="eod", context="dataframe")
def monthly_returns(
    df: DataFrame,
    price: str,
    date_col: str = "Date",
    by: Optional[list] = None,
) -> DataFrame:
    """Calendar-month return series: for each (year, month), the
    month-end price over the previous month-end price − 1 (the long-format
    core of the classic ffn monthly-returns table; the first month, having
    no predecessor, is the return from the month's first observation).

    One aggregate to month-ends (``max_by`` struct idiom — order-free, no
    sort), one lag window over the tiny month-level frame. The month-end
    reduction is where the data size dies; everything after is
    months × groups rows.

    Returns ``(*by, year, month, month_return)``.
    """
    by = list(by or [])
    d = to_col(date_col)
    p = to_col(price)
    ends = (
        df.groupBy(*by, F.year(d).alias("year"), F.month(d).alias("month"))
        .agg(
            last_by(p, d).alias("__end"),
            first_by(p, d).alias("__first"),
        )
    )
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("year", "month")
    prev = F.lag("__end").over(w)
    ret = F.when(prev.isNotNull(), safe_div(F.col("__end"), prev) - 1).otherwise(
        safe_div(F.col("__end"), F.col("__first")) - 1
    )
    return ends.select(
        *by, "year", "month", F.round(ret, 6).alias("month_return")
    )


@register(namespace="eod", kind="df", context="dataframe", alias="portfolio_returns")
def portfolio_returns(
    df: DataFrame,
    weights: dict,
    key_col: str,
    ts_col: str,
    return_col: str,
) -> DataFrame:
    """Portfolio return series from per-asset returns and target weights
    (daily-rebalanced convention: each period's portfolio return is the
    weighted mean of that period's asset returns). Weights renormalize
    over the assets PRESENT that period, so a late-listing or halted
    asset shifts its weight pro-rata onto the others instead of silently
    shrinking the portfolio — the standard index-construction treatment
    of missing constituents.

    The output composes with the whole EOD suite: feed it to
    [[to_price_index]] for the equity curve, [[calc_max_drawdown]] /
    [[calc_sharpe]] / [[calc_var_cvar]] for the risk panel.

    ``weights`` is a plain dict (asset -> weight) folded into an in-plan
    literal map — no join at all; the plan is one projection plus one
    ``groupBy(ts)`` aggregate, shuffling only (period, partial-sum) rows.

    Returns ``(ts, portfolio_return, n_assets)`` for periods with at
    least one weighted asset reporting a return.
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
    )
    w = F.element_at(wmap, F.col(key_col)).cast("double")
    r = F.col(return_col).cast("double")
    pre = df.select(
        F.col(ts_col).alias("ts"), w.alias("__w"), r.alias("__r")
    ).where(F.col("__w").isNotNull() & F.col("__r").isNotNull())
    return (
        pre.groupBy("ts")
        .agg(
            # NULL on zero total present-asset weight (ANSI zero-div
            # audit, r13)
            F.when(
                F.sum("__w") != 0.0,
                F.sum(F.col("__w") * F.col("__r")) / F.sum("__w"),
            ).alias("portfolio_return"),
            F.count(F.lit(1)).alias("n_assets"),
        )
    )


@register(namespace="eod", kind="df", context="dataframe", alias="portfolio_turnover")
def portfolio_turnover(
    df: DataFrame,
    weights: dict,
    key_col: str,
    ts_col: str,
    return_col: str,
    cost_bps: float = 10.0,
) -> DataFrame:
    """[[portfolio_returns]] extended with the cost of the daily rebalance
    itself: within each period the target weights drift with that period's
    returns (``w_i(1+r_i) / Σ_j w_j(1+r_j)``), the rebalance trades the
    book back to target, and one-way turnover is ``½·Σ|target − drifted|``.
    ``net_return = portfolio_return − (cost_bps/1e4)·turnover`` charges
    that trading at ``cost_bps`` per unit of one-way notional — the
    standard back-test haircut separating a paper strategy from an
    implementable one.

    Same no-join shape as [[portfolio_returns]] (literal weight map), with
    one window-over-``ts`` for the cross-sectional sums feeding the same
    hash partitioning the final ``groupBy(ts)`` reuses — the shuffle moves
    ``(period, asset)`` rows once. Weights renormalize over present
    assets, matching [[portfolio_returns]].

    Returns ``(ts, portfolio_return, turnover, net_return, n_assets)``.
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
    )
    w = F.element_at(wmap, F.col(key_col)).cast("double")
    r = F.col(return_col).cast("double")
    pre = df.select(
        F.col(ts_col).alias("ts"), w.alias("__w"), r.alias("__r")
    ).where(F.col("__w").isNotNull() & F.col("__r").isNotNull())
    wts = Window.partitionBy("ts")
    staged = pre.select(
        "ts",
        "__w",
        "__r",
        F.sum("__w").over(wts).alias("__sw"),
        F.sum(F.col("__w") * (F.lit(1.0) + F.col("__r")))
        .over(wts)
        .alias("__swg"),
        F.sum(F.col("__w") * F.col("__r")).over(wts).alias("__swr"),
    )
    drift = F.when(
        F.col("__swg") != 0,
        F.col("__w") * (F.lit(1.0) + F.col("__r")) / F.col("__swg"),
    )
    # zero total present-asset weight -> undefined book, NULL (the same
    # ANSI zero-div guard portfolio_returns carries)
    dev = F.when(
        F.col("__sw") != 0, F.abs(F.col("__w") / F.col("__sw") - drift)
    )
    tc = F.lit(float(cost_bps)) / F.lit(10000.0)
    g = staged.groupBy("ts").agg(
        F.max(
            F.when(F.col("__sw") != 0, F.col("__swr") / F.col("__sw"))
        ).alias("portfolio_return"),
        (F.lit(0.5) * F.sum(dev)).alias("turnover"),
        F.count(F.lit(1)).alias("n_assets"),
    )
    return g.select(
        "ts",
        "portfolio_return",
        "turnover",
        (F.col("portfolio_return") - tc * F.col("turnover")).alias(
            "net_return"
        ),
        "n_assets",
    )
