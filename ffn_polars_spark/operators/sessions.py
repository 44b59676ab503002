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
