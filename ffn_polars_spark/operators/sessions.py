"""Event sessionization — gap-based session assignment over a stream table.

The batch form of what the streaming module does with session windows: a
cumulative-sum-of-boundaries window, one shuffle on the user key. Standard
pattern for clickstream/training-telemetry pipelines.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="sessionize")
def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: int = 30 * 60 * 1_000_000_000,
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap since
    the previous event exceeds ``gap`` (same units as ``ts_col``; default
    30 min in nanoseconds). Adds ``session_id`` (0-based per key)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col, 1).over(w)
    boundary = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("session_id", F.sum(boundary).over(wc) - F.lit(1))


@register(namespace="eod", kind="df", context="dataframe", alias="session_stats")
def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: int = 30 * 60 * 1_000_000_000,
) -> DataFrame:
    """Per-session row counts and durations (ns units by default).

    The sessionize window and this groupBy hash on the same key, so the agg
    reuses the window's exchange — one shuffle end to end.
    """
    s = sessionize(df, ts_col, key_col, gap)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="attribution")
def attribution(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    channel_col: str,
    conversion_col: str,
    value_col: str,
    gap: int,
) -> DataFrame:
    """Session-scoped marketing attribution: sessionize each key's events
    (same gap rule as [[sessionize]]), then per session report the
    first-touch channel, the last channel strictly before the first
    conversion (NULL when the session converts on its opening event or
    never), and the session's total conversion value — the frame both
    first-touch and last-touch revenue roll-ups aggregate from.

    One ordered window pass for the session boundaries (lag + running
    sum), a session-window min for the first conversion time, and one
    hash aggregate per session — a single exchange on the key, reusing
    its sort throughout. Returns ``(key, session_id, first_touch,
    last_touch, conversion_value, n_events)``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(key_col, "__sess")
    ts = F.col(ts_col)
    boundary = F.when(
        F.lag(ts).over(w).isNull() | (ts - F.lag(ts).over(w) > gap), 1
    ).otherwise(0)
    is_conv = (
        F.col(conversion_col) if isinstance(conversion_col, str) else conversion_col
    )
    staged = (
        df.withColumn("__sess", F.sum(boundary).over(wcum) - F.lit(1))
        .withColumn(
            "__conv_ts", F.min(F.when(is_conv, ts)).over(w_all)
        )
    )
    pre_conv = F.col("__conv_ts").isNotNull() & (ts < F.col("__conv_ts"))
    agg = staged.groupBy(key_col, "__sess").agg(
        F.min_by(F.col(channel_col), ts).alias("first_touch"),
        F.max_by(
            F.when(pre_conv, F.col(channel_col)), F.when(pre_conv, ts)
        ).alias("last_touch"),
        F.sum(
            F.when(is_conv, F.col(value_col).cast("double")).otherwise(F.lit(0.0))
        ).alias("conversion_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.withColumnRenamed("__sess", "session_id")
