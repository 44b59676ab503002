"""Tick flow operators — #28-31 of SURVEY.md §2.6.

Parity targets: /root/reference/ffn_polars/expr/tick/flow.py. All four are
plain distributed aggregates (partial + final, map-side combined) usable
directly inside ``groupBy(...).agg(...)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ffn_polars_spark.config import SCALE
from ffn_polars_spark.core import ColumnOrName, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="tick", context="scalar")
@auto_alias("volume_rate")
@guard_input("self", expected_dtype="long")
@guard_input("ts", expected_dtype="timestamp")
def calc_volume_rate(self: ColumnOrName, ts: ColumnOrName, per: str = "s") -> Column:
    """Volume traded per time unit: ``sum(v) / ((max(ts)-min(ts))/scale)``.

    ``ts`` is epoch-ns LongType. Reference: flow.py:9-36 (incl. the
    ValueError on an unknown unit).
    """
    scale = SCALE.get(per)
    if scale is None:
        raise ValueError(f"Unsupported time unit: {per}")
    t = to_col(ts)
    span = (F.max(t) - F.min(t)).cast("double") / F.lit(float(scale))
    # NULL on a zero span — same contract and ANSI rationale as
    # calc_trade_rate (r13 audit)
    return F.when(span != 0.0, F.sum(self).cast("double") / span)


@register(namespace="tick", context="scalar")
@auto_alias("order_flow_imbalance")
@guard_input("self", expected_dtype="double")
def calc_order_flow_imbalance(self: ColumnOrName) -> Column:
    """Order-flow imbalance: sum of signed volume (+V buyer-initiated,
    −V seller-initiated). Reference: flow.py:39-58."""
    return F.sum(self).cast("double")


@register(namespace="tick", context="scalar")
@auto_alias("traded_value")
@guard_input("self", expected_dtype="double")
@guard_input("volume", expected_dtype="double")
def calc_traded_value(self: ColumnOrName, volume: ColumnOrName) -> Column:
    """Total traded (dollar) value: ``sum(price * volume)``. Reference:
    flow.py:61-81."""
    return F.sum(to_col(self) * to_col(volume)).cast("double")


@register(namespace="tick", context="scalar")
@auto_alias("vwap")
@guard_input("self", expected_dtype="double")
@guard_input("volume", expected_dtype="double")
def calc_vwap(self: ColumnOrName, volume: ColumnOrName) -> Column:
    """Volume-weighted average price: ``sum(p*v) / sum(v)``. Reference:
    flow.py:84-103. NULL on zero total volume (undefined weighting; the
    bare division throws an ANSI DIVIDE_BY_ZERO — r13 audit)."""
    v = to_col(volume)
    tot = F.sum(v).cast("double")
    return F.when(tot != 0.0, F.sum(to_col(self) * v) / tot)


@register(namespace="tick", kind="df", context="dataframe", alias="execution_slippage")
def execution_slippage(
    df,
    price: str,
    volume: str,
    ts: str,
    by=None,
    bucket_ns: int = 86_400_000_000_000,
):
    """Per-trade execution slippage against the interval VWAP benchmark:
    ``d · (p − vwap) / vwap`` with tick-rule trade signs — positive means
    the trade paid up relative to where volume actually cleared in its
    bucket (day by default), the standard transaction-cost-analysis view
    of [[calc_vwap]]. The benchmark is the per-(group, bucket) VWAP
    computed with an unordered window over the same partitioning the
    sign's ordered window already established — one exchange total, no
    join. Returns the input rows + ``bucket``, ``vwap``, ``slippage``.
    """
    from pyspark.sql.window import Window

    from ffn_polars_spark.core import Over
    from ffn_polars_spark.functions.tick_direction import tick_rule

    keys = [by] if isinstance(by, str) else list(by or [])
    p = F.col(price).cast("double")
    v = F.col(volume).cast("double")
    bucket = F.floor(F.col(ts) / F.lit(bucket_ns)).cast("long")
    over = Over(order_by=[ts], partition_by=keys or None)
    # The ordered tick-rule window runs FIRST: its hash(keys) exchange also
    # satisfies the bucket window's clustered-by-(keys, bucket) requirement
    # (subset rule), so the whole operator is one exchange + a local sort.
    pre = (
        df.withColumn("__bucket", bucket)
        .withColumn("__d", tick_rule(p, over=over).cast("double"))
    )
    w_b = Window.partitionBy(*(keys + ["__bucket"]))
    vwap = F.when(
        F.sum(v).over(w_b) != 0.0, F.sum(p * v).over(w_b) / F.sum(v).over(w_b)
    )
    slip = F.when(vwap != 0, F.col("__d") * (p - vwap) / vwap)
    return (
        pre.withColumn("vwap", vwap)
        .withColumn("slippage", slip)
        .withColumnRenamed("__bucket", "bucket")
        .drop("__d")
    )


@register(namespace="tick", kind="df", context="dataframe", alias="volume_curve")
def volume_curve(
    df,
    volume: str,
    ts: str,
    by=None,
    period_ns: int = 86_400_000_000_000,
    buckets: int = 24,
):
    """Average intraday volume curve: each (key, day, bucket)'s share of
    its day's volume, averaged across days — the participation schedule a
    VWAP/POV execution algorithm follows, and the denominator model for
    [[execution_slippage]]-style TCA. Days with zero volume are excluded
    (no share to average).

    Two stacked hash aggregates — (key, day, bucket) sums, then the day
    totals come from re-aggregating that frame (the tick table is read
    once) — and a final (key, bucket) average over days.
    Returns ``(keys, bucket, avg_share, n_days)``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    v = F.col(volume).cast("double")
    day = F.floor(F.col(ts) / F.lit(period_ns)).cast("long")
    bucket = F.floor(
        (F.col(ts) % F.lit(period_ns)) / F.lit(period_ns // buckets)
    ).cast("int")
    per_bucket = (
        df.withColumn("__day", day)
        .withColumn("__bucket", bucket)
        .groupBy(*(keys + ["__day", "__bucket"]))
        .agg(F.sum(v).alias("__bv"))
    )
    from pyspark.sql.window import Window

    w_day = Window.partitionBy(*(keys + ["__day"]))
    share = per_bucket.withColumn(
        "__share",
        F.when(
            F.sum("__bv").over(w_day) > 0,
            F.col("__bv") / F.sum("__bv").over(w_day),
        ),
    ).where(F.col("__share").isNotNull())
    return (
        share.groupBy(*(keys + ["__bucket"]))
        .agg(
            F.avg("__share").alias("avg_share"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .withColumnRenamed("__bucket", "bucket")
    )
