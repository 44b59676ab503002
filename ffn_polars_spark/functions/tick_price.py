"""Tick price & volatility operators — #35-38 of SURVEY.md §2.8.

Parity targets: /root/reference/ffn_polars/expr/tick/price.py and
volatility.py. ``calc_realized_volatility`` is the canonical
sequence-dependent aggregate: the log-return lag restarts within each group,
so the grouped form windows first (partitioned by the group keys, ordered by
the tick timestamp) and aggregates second — Catalyst plans both over one
exchange.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.core import ColumnOrName, Over, first_by, last_by, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="tick", context="series")
@auto_alias("micro_returns")
@guard_input("self", expected_dtype="double")
def calc_micro_returns(self: ColumnOrName, *, over: Over) -> Column:
    """Tick-level log returns: ``log(p_t) - log(p_{t-1})``. Reference:
    price.py:8-19."""
    c = F.log(to_col(self))
    w = over.w_ordered("calc_micro_returns")
    return c - F.lag(c, 1).over(w)


@register(namespace="tick", context="scalar")
@auto_alias("price_volatility_ratio")
@guard_input("self", expected_dtype="double")
def calc_price_volatility_ratio(self: ColumnOrName) -> Column:
    """Coefficient of variation: ``stddev_samp(p) / mean(p)``. Reference:
    price.py:22-33."""
    c = to_col(self)
    return F.stddev_samp(c) / F.avg(c)


@register(namespace="tick", context="scalar")
@auto_alias("price_impact")
@guard_input("self", expected_dtype="double")
@guard_input("volume", expected_dtype="double")
def calc_price_impact(self: ColumnOrName, volume: ColumnOrName, ts: ColumnOrName) -> Column:
    """Price impact: ``(last(p) - first(p)) / sum(volume)``.

    ``ts`` makes first/last explicit (order-free struct min/max). Reference:
    price.py:36-55.
    """
    return (last_by(self, ts) - first_by(self, ts)) / F.sum(volume).cast("double")


def realized_volatility_agg(log_returns: ColumnOrName) -> Column:
    """Aggregate half of #38: ``sqrt(sum(r^2))`` over precomputed log returns."""
    return F.sqrt(F.sum(F.pow(to_col(log_returns), F.lit(2))))


@register(namespace="tick", context="dataframe")
def calc_realized_volatility(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Realized volatility (non-annualized): ``sqrt(Σ (log p_t − log p_{t−1})²)``
    per group, with the lag restarting at group boundaries (the contract
    pinned by reference tests/expr/test_tick.py:202-222). Reference:
    volatility.py:7-28.
    """
    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    pre = df.withColumn("__r", calc_micro_returns(price, over=over))
    out = f"{price}_realized_volatility"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(realized_volatility_agg("__r").alias(out))


calc_realized_volatility._alias_suffix = "realized_volatility"
