"""EOD risk operators — #16-19 of SURVEY.md §2.3.

Parity targets: /root/reference/ffn_polars/expr/eod/risk.py. The running-max
(high-water-mark) pieces are ROWS-frame window aggregates; the scalar forms
(ulcer index, max drawdown, UPI) are two-phase — window for the cumulative
part, then a groupBy aggregate on the same keys, which Catalyst plans as a
single shuffle (the exchange introduced for the window already satisfies the
aggregate's distribution requirement).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.core import ColumnOrName, Over, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="eod", context="series")
@auto_alias("drawdowns")
@guard_input("self", expected_dtype="double")
def to_drawdown_series(self: ColumnOrName, *, over: Over) -> Column:
    """Drawdown series: forward-fill price gaps, then ``p / cummax(p) - 1``.

    0 at all-time highs, negative below the high-water mark. Reference:
    risk.py:61-84 (forward_fill + cum_max).
    """
    w = over.w_cum("to_drawdown_series")
    filled = F.last(self, ignorenulls=True).over(w)
    hwm = F.max(filled).over(w)
    return filled / hwm - 1


def drawdown_pct_series(price: ColumnOrName, *, over: Over) -> Column:
    """Ulcer building block: ``(p - cummax(p)) / cummax(p) * 100`` (no ffill —
    the reference's ulcer path uses raw prices, risk.py:22-24)."""
    w = over.w_cum("ulcer_index")
    p = to_col(price)
    hwm = F.max(p).over(w)
    return (p - hwm) / hwm * 100


def ulcer_index_agg(dd_pct: ColumnOrName) -> Column:
    """Aggregate half of the ulcer index: ``sqrt(mean(dd_pct^2))``."""
    return F.sqrt(F.avg(F.pow(to_col(dd_pct), F.lit(2))))


def max_drawdown_agg(dd: ColumnOrName) -> Column:
    """Aggregate half of max drawdown: ``min(drawdown_series)`` (risk.py:95)."""
    return F.min(to_col(dd))


@register(namespace="eod", context="dataframe")
def calc_max_drawdown(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Max drawdown per group: ``min(p/cummax(p) - 1)``. Reference: risk.py:87-95."""
    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    pre = df.withColumn("__dd", to_drawdown_series(price, over=over))
    out = f"{price}_max_drawdown"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(max_drawdown_agg("__dd").alias(out))


calc_max_drawdown._alias_suffix = "max_drawdown"


@register(namespace="eod", context="dataframe")
def ulcer_index(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Ulcer index per group: ``sqrt(mean(((p - cummax)/cummax * 100)^2))``.

    Reference: risk.py:10-26.
    """
    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    pre = df.withColumn("__ddpct", drawdown_pct_series(price, over=over))
    out = f"{price}_ulcer_index"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(ulcer_index_agg("__ddpct").alias(out))


ulcer_index._alias_suffix = "ulcer_index"


@register(namespace="eod", context="dataframe")
def ulcer_performance_index(
    df: DataFrame,
    price: str,
    rf: Union[float, str] = 0.0,
    n: Optional[int] = None,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Ulcer Performance Index: ``mean(excess returns) / ulcer_index(price)``.

    float rf: per-period ``rf/n`` subtracted (requires n when rf != 0 —
    ValueError, risk.py:47-48); str rf: a returns column subtracted; anything
    else TypeError. Reference: risk.py:29-58.
    """
    from ffn_polars_spark.functions.eod_returns import to_returns

    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    rets = to_returns(price, over=over)

    if isinstance(rf, float):
        if rf != 0 and n is None:
            raise ValueError("nperiods must be set when rf is a non-zero float")
        excess = rets - F.lit(rf / n if rf != 0 else 0.0)
    elif isinstance(rf, str):
        excess = rets - F.col(rf)
    else:
        raise TypeError("rf must be a float or a string (column name)")

    pre = df.withColumn("__excess", excess).withColumn(
        "__ddpct", drawdown_pct_series(price, over=over)
    )
    out = f"{price}_ulcer_performance_index"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg((F.avg("__excess") / ulcer_index_agg("__ddpct")).alias(out))


ulcer_performance_index._alias_suffix = "ulcer_performance_index"
