"""Tick activity operators — #25-27 of SURVEY.md §2.5.

Parity targets: /root/reference/ffn_polars/expr/tick/activity.py. Tick
timestamps are LongType epoch-nanoseconds (FIXTURES.md; Spark TimestampType
is µs-precision and would truncate exchange feeds). ``calc_trade_rate`` is a
pure aggregate; inter-trade time and burstiness depend on consecutive deltas,
so their grouped forms are two-phase (ordered window for the lag-diff, then an
aggregate over the same partition keys — one shuffle total).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.config import SCALE
from ffn_polars_spark.core import ColumnOrName, Over, safe_div, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


def _scale(per: str) -> int:
    scale = SCALE.get(per)
    if scale is None:
        raise ValueError(f"Unsupported time unit: {per}")
    return scale


@register(namespace="tick", context="scalar")
@auto_alias("trade_rate")
@guard_input("self", expected_dtype="timestamp")
def calc_trade_rate(self: ColumnOrName, per: str = "ms") -> Column:
    """Trades per time unit: ``count / ((last_ts - first_ts) / scale)``.

    ``self`` is an epoch-ns LongType timestamp column. Reference:
    activity.py:8-29 (last-first on sorted data == max-min).
    """
    scale = _scale(per)
    c = to_col(self)
    span = (F.max(c) - F.min(c)).cast("double") / F.lit(float(scale))
    # NULL on a zero span (single-event or single-timestamp groups — the
    # overwhelmingly common sparse-key case at scale): the rate is
    # undefined, and the bare division throws an ANSI DIVIDE_BY_ZERO
    # (r13 audit; NULL matches the DuckDB oracle's zero-div convention)
    return F.when(span != 0.0, F.count(F.lit(1)).cast("double") / span)


def inter_trade_times(ts: ColumnOrName, per: str = "s", *, over: Over) -> Column:
    """Series of consecutive timestamp deltas in the requested unit (the
    lag-diff building block shared by #26/#27)."""
    scale = _scale(per)
    c = to_col(ts)
    w = over.w_ordered("inter_trade_times")
    return (c - F.lag(c, 1).over(w)).cast("double") / F.lit(float(scale))


def inter_trade_time_agg(itt: ColumnOrName) -> Column:
    """Aggregate half of #26: mean of the delta column."""
    return F.avg(to_col(itt))


def burstiness_agg(itt: ColumnOrName) -> Column:
    """Aggregate half of #27: coefficient of variation of the deltas.

    Null when fewer than 2 deltas exist (sample stddev undefined — the
    contract asserted by reference tests/expr/test_tick.py:342-378) and
    when the mean delta is 0 (every event on one timestamp: the CV is
    undefined, and the unguarded division threw an ANSI DIVIDE_BY_ZERO —
    r13 audit; NULL matches the DuckDB oracle's zero-div convention).
    """
    c = to_col(itt)
    mu = F.avg(c)
    return F.when(mu != 0.0, F.stddev_samp(c) / mu)


@register(namespace="tick", context="dataframe")
def calc_inter_trade_time(
    df: DataFrame,
    ts: str,
    per: str = "s",
    by: Optional[list] = None,
) -> DataFrame:
    """Mean time between consecutive trades, per group. Reference:
    activity.py:32-55 (``mean(diff(ts))`` — NOT ``(max-min)/(n-1)``, which
    differs in the presence of null timestamps)."""
    by = list(by or [])
    over = Over(order_by=ts, partition_by=by or None)
    pre = df.withColumn("__itt", inter_trade_times(ts, per, over=over))
    out = f"{ts}_inter_trade_time"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(inter_trade_time_agg("__itt").alias(out))


calc_inter_trade_time._alias_suffix = "inter_trade_time"


@register(namespace="tick", context="dataframe")
def calc_burstiness(
    df: DataFrame,
    ts: str,
    per: str = "s",
    by: Optional[list] = None,
) -> DataFrame:
    """Burstiness: ``std(inter-trade time) / mean(inter-trade time)`` per
    group. Reference: activity.py:58-77."""
    by = list(by or [])
    over = Over(order_by=ts, partition_by=by or None)
    pre = df.withColumn("__itt", inter_trade_times(ts, per, over=over))
    out = f"{ts}_burstiness"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(burstiness_agg("__itt").alias(out))


calc_burstiness._alias_suffix = "burstiness"


@register(namespace="tick", kind="df", context="dataframe", alias="intraday_profile")
def intraday_profile(
    df: DataFrame,
    price_col: str,
    volume_col: str,
    ts_col: str = "ts_ns",
    by: Optional[list] = None,
    order_by: Optional[list] = None,
) -> DataFrame:
    """Intraday seasonality profile: per key and UTC hour-of-day, the
    activity panel that exposes the open/close U-shape — trade count,
    summed volume, the key's volume share landing in that hour, mean
    absolute return, and realized volatility (``sqrt(Σ r²)``). The
    time-of-day complement to [[time_bars]]' calendar bucketing.

    One ordered window pass per key computes tick returns (lags share the
    sort), one ``(key, hour)`` aggregate reduces — the post-aggregate
    volume-share window runs over at most 24 rows per key, so the second
    exchange moves a profile, not the tape. ``ts_col`` is epoch-ns.

    Returns ``(*by, hour, n_trades, volume, volume_share, mean_abs_r,
    realized_vol)``.
    """
    from pyspark.sql import Window

    keys = [by] if isinstance(by, str) else list(by or [])
    order = list(order_by or [ts_col])
    w = Window.partitionBy(*keys).orderBy(*order)
    p = F.col(price_col)
    # NULL return off a zero previous print (ANSI zero-div guard)
    r = safe_div(p, F.lag(p).over(w)) - F.lit(1.0)
    # epoch-ns exceeds double's 53-bit mantissa, so reduce mod one day in
    # exact long arithmetic FIRST; the remainder (< 8.64e13) divides exactly
    hour = F.floor(
        (F.col(ts_col) % F.lit(86_400_000_000_000))
        / F.lit(3_600_000_000_000)
    ).alias("hour")
    staged = df.select(
        *keys, hour, F.col(volume_col).alias("__v"), r.alias("__r")
    )
    g = staged.groupBy(*(keys + ["hour"])).agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("__v").alias("volume"),
        F.avg(F.abs(F.col("__r"))).alias("mean_abs_r"),
        F.sqrt(F.sum(F.col("__r") * F.col("__r"))).alias("realized_vol"),
    )
    share_w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    return g.select(
        *keys,
        "hour",
        "n_trades",
        "volume",
        F.when(
            F.sum("volume").over(share_w) != 0.0,
            F.col("volume") / F.sum("volume").over(share_w),
        ).alias("volume_share"),
        "mean_abs_r",
        "realized_vol",
    )


@register(namespace="tick", kind="df", context="dataframe", alias="self_excitation")
def self_excitation(
    df: DataFrame,
    ts_col: str = "ts_ns",
    by: Optional[str] = None,
    tau: float = 1_000_000_000.0,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Hawkes-style self-excitation screen: the fraction of inter-event
    gaps shorter than ``tau`` against the Poisson expectation
    ``1 − exp(−λτ)`` at the key's own average rate — a ratio well
    above 1 means events CAUSE nearby events (bursts that
    [[calc_burstiness]]'s CV measures in aggregate, localized here to
    a timescale you choose), the trigger condition for cascade-aware
    throttling and for Hawkes-class models.

    One lag window per key + one closed-form aggregate; λ = (n−1)/span
    is the MLE under the Poisson null. NULL ratio when the key has
    < 2 events or zero span. Returns ``(*by, n, lam, frac_observed,
    frac_expected, excitation_ratio)`` — λ in events per ``ts_col``
    unit.
    """
    from pyspark.sql.window import Window

    keys = [by] if isinstance(by, str) else list(by or [])
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    ts = F.col(ts_col).cast("double")
    gap = ts - F.lag(ts).over(w)
    staged = df.select(*keys, ts.alias("__ts"), gap.alias("__gap"))
    g = staged.groupBy(*keys) if keys else staged.groupBy()
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__gap") < F.lit(float(tau)), 1).otherwise(0))
        .cast("long")
        .alias("__short"),
        F.count("__gap").cast("long").alias("__ngaps"),
        (F.max("__ts") - F.min("__ts")).alias("__span"),
    )
    lam = F.when(
        F.col("__span") > 0,
        (F.col("n") - 1).cast("double") / F.col("__span"),
    )
    frac_obs = F.when(
        F.col("__ngaps") > 0,
        F.col("__short").cast("double") / F.col("__ngaps").cast("double"),
    )
    frac_exp = F.lit(1.0) - F.exp(-lam * F.lit(float(tau)))
    ratio = F.when(frac_exp > 0, frac_obs / frac_exp)
    return agg.select(
        *keys,
        "n",
        lam.alias("lam"),
        frac_obs.alias("frac_observed"),
        frac_exp.alias("frac_expected"),
        ratio.alias("excitation_ratio"),
    )
