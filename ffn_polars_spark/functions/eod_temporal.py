"""EOD temporal operators — #20-24 of SURVEY.md §2.4.

Parity targets: /root/reference/ffn_polars/expr/eod/temporal.py. The
frequency-inference pair (#22, #23) is mode-of-timestamp-deltas matched
against calendar tolerances; the reference computes it in a ``map_batches``
Python callback, but the whole ladder is plain conditional logic, so here it
is native SQL: lag-diff window → distributed count-per-delta → deterministic
arg-max (``max(struct(count, -delta))``, smallest delta wins ties) → CASE
ladder. No UDF, no driver collect — scales to any number of groups.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.config import TRADING_DAYS_PER_YEAR
from ffn_polars_spark.core import ColumnOrName, Over, epoch_seconds, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="eod", context="elementwise")
@auto_alias("deannualized")
@guard_input("self", expected_dtype="double")
def deannualize(self: ColumnOrName, n: int) -> Column:
    """Annualized → periodic returns: ``(1+r)^(1/n) - 1`` (temporal.py:10-21)."""
    return F.pow(to_col(self) + 1.0, F.lit(1.0) / F.lit(float(n))) - 1.0


@register(namespace="eod", context="elementwise")
@auto_alias("annualized")
@guard_input("self", expected_dtype="double")
@guard_input("durations", expected_dtype="double")
def annualize(self: ColumnOrName, durations: ColumnOrName, one_year: float = 365.0) -> Column:
    """Periodic → annualized returns over holding durations:
    ``(1+r)^(one_year/durations) - 1`` (temporal.py:24-40)."""
    return F.pow(to_col(self) + 1.0, F.lit(float(one_year)) / to_col(durations)) - 1.0


@register(namespace="eod", context="scalar")
@auto_alias("year_frac")
@guard_input("self", expected_dtype="timestamp")
def year_frac(self: ColumnOrName) -> Column:
    """Year fraction between first and last timestamp, 365.25-day years.

    The reference truncates the span to whole seconds
    (``.dt.total_seconds()`` on a Duration, temporal.py:153-163) — mirrored
    with ``floor`` so golden values match exactly.
    """
    secs = epoch_seconds(self)
    return F.floor(F.max(secs) - F.min(secs)) / F.lit(31_557_600.0)


# ---------------------------------------------------------------------------
# Frequency inference (#22 infer_nperiods, #23 infer_freq).
# ---------------------------------------------------------------------------


def _delta_stats(
    df: DataFrame, date_col: str, by: list
) -> DataFrame:
    """Per-group (std, mode) of consecutive timestamp deltas in seconds.

    Deltas via one ordered window; mode via count-per-delta then a
    deterministic arg-max (ties → smallest delta). Zero/negative deltas are
    dropped (the reference filters ``seconds > 1e-9``, temporal.py:62).
    """
    over = Over(order_by=date_col, partition_by=by or None)
    # Difference in exact integer microseconds, THEN scale to seconds —
    # subtracting after the double conversion loses the sub-second fraction
    # at 2020-era epoch magnitudes (2^-22 s ulp).
    micros = F.unix_micros(to_col(date_col).cast("timestamp"))
    delta = (micros - F.lag(micros, 1).over(over.w_ordered("infer_freq"))).cast(
        "double"
    ) / F.lit(1_000_000.0)
    d = (
        df.select(*by, delta.alias("__delta"))
        .where(F.col("__delta").isNotNull() & (F.col("__delta") > 1e-9))
    )
    stats = d.groupBy(*by).agg(
        F.stddev_samp("__delta").alias("__std"),
        F.count("__delta").alias("__m"),
    )
    mode = (
        d.groupBy(*(by + ["__delta"]))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy(*by)
        .agg(
            F.max(
                F.struct(
                    F.col("__cnt").alias("c"), (-F.col("__delta")).alias("nd")
                )
            ).alias("__top")
        )
        .select(*by, (-F.col("__top.nd")).alias("__mode"))
    )
    if by:
        return stats.join(mode, on=by)
    return stats.crossJoin(mode)


@register(namespace="eod", context="dataframe")
def infer_nperiods(
    df: DataFrame,
    date_col: str,
    annualization_factor: Optional[int] = None,
    by: Optional[list] = None,
) -> DataFrame:
    """Periods-per-year inferred from the modal timestamp delta.

    Ladder (temporal.py:59-92): yearly 1, quarterly 4, monthly 12, weekly 52,
    daily ``af`` (default 252), hourly ``af*24``, minutely ``af*1440``,
    secondly ``af*86400``, sub-second ``round(af*86400/dt)``. Null when there
    are no valid deltas or the delta stddev exceeds 1e-3 (irregular series).
    Divergence note: with exactly one delta the sample stddev is undefined —
    the reference's Python comparison would raise; we treat it as regular
    (std→0) and fall through to the ladder.
    """
    af = annualization_factor or TRADING_DAYS_PER_YEAR
    by = list(by or [])
    stats = _delta_stats(df, date_col, by)
    dt = F.col("__mode")
    day = 86400.0
    ladder = (
        F.when(F.abs(dt - 365 * day) <= day, F.lit(1))
        .when(F.abs(dt - 91 * day) <= 3 * day, F.lit(4))
        .when(F.abs(dt - 30 * day) <= 3 * day, F.lit(12))
        .when(F.abs(dt - 7 * day) <= 60, F.lit(52))
        .when(F.abs(dt - day) <= 10, F.lit(af))
        .when(F.abs(dt - 3600) <= 5, F.lit(af * 24))
        .when(F.abs(dt - 60) <= 1, F.lit(af * 24 * 60))
        .when(F.abs(dt - 1) <= 0.1, F.lit(af * 24 * 60 * 60))
        .when(dt > 0, F.round(F.lit(float(af) * day) / dt).cast("long"))
    )
    out = f"{date_col}_nperiods"
    result = F.when(
        (F.col("__m") >= 1) & (F.coalesce(F.col("__std"), F.lit(0.0)) <= 1e-3), ladder
    ).cast("long")
    return stats.select(*by, result.alias(out))


infer_nperiods._alias_suffix = "nperiods"


@register(namespace="eod", context="dataframe")
def infer_freq(
    df: DataFrame,
    date_col: str,
    by: Optional[list] = None,
) -> DataFrame:
    """Human-readable calendar frequency label from the modal delta (in days):
    yearly |d−365.25|<5, quarterly |d−91|≤3, monthly |d−30|≤3, weekly
    |d−7|≤1, daily |d−1|≤0.1, else/irregular (delta-std > 1 day or undefined)
    → "unknown". Reference: temporal.py:95-150.
    """
    by = list(by or [])
    stats = _delta_stats(df, date_col, by)
    day = 86400.0
    d = F.col("__mode") / F.lit(day)
    std_days = F.col("__std") / F.lit(day)
    ladder = (
        F.when(F.abs(d - 365.25) < 5, F.lit("yearly"))
        .when(F.abs(d - 91) <= 3, F.lit("quarterly"))
        .when(F.abs(d - 30) <= 3, F.lit("monthly"))
        .when(F.abs(d - 7) <= 1, F.lit("weekly"))
        .when(F.abs(d - 1) <= 0.1, F.lit("daily"))
        .otherwise(F.lit("unknown"))
    )
    out = f"{date_col}_inferred_freq"
    result = F.when(std_days.isNull() | (std_days > 1.0), F.lit("unknown")).otherwise(ladder)
    return stats.select(*by, result.alias(out))


infer_freq._alias_suffix = "inferred_freq"


@register(namespace="eod", kind="df", context="dataframe", alias="weekday_returns")
def weekday_returns(
    df: DataFrame,
    return_col: str,
    date_col: str,
    by: Optional[list] = None,
) -> DataFrame:
    """Day-of-week seasonality panel over a daily return series: per
    weekday, the observation count, mean return, sample volatility, win
    rate, and the one-sample t-statistic ``mean / (vol / √n)`` — the
    standard screen for calendar anomalies (Monday effect etc.). The
    calendar complement to [[intraday_profile]]'s hour-of-day panel.

    The weekday is computed engine-portably as
    ``(days_since_epoch + 4) mod 7`` (0 = Sunday — 1970-01-01 was a
    Thursday), avoiding the engines' conflicting ``dayofweek``
    conventions. One projection, one tiny aggregate — a single shuffle of
    (weekday, partials).

    Returns ``(*by, dow, n, mean_r, vol, win_rate, t_stat)``.
    """
    by = list(by or [])
    r = F.col(return_col).cast("double")
    dow = (
        (F.datediff(F.col(date_col), F.to_date(F.lit("1970-01-01"))) + 4) % 7
    ).cast("long").alias("dow")
    staged = df.select(*by, dow, r.alias("__r")).where(
        F.col("__r").isNotNull()
    )
    n = F.count("__r")
    mean = F.avg("__r")
    vol = F.stddev_samp("__r")
    return staged.groupBy(*(by + ["dow"])).agg(
        n.alias("n"),
        mean.alias("mean_r"),
        vol.alias("vol"),
        F.avg((F.col("__r") > 0).cast("double")).alias("win_rate"),
        F.when(vol > 0, mean / (vol / F.sqrt(n.cast("double")))).alias(
            "t_stat"
        ),
    )
