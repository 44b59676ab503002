"""Tick direction operators — #32-34 of SURVEY.md §2.7.

Parity targets: /root/reference/ffn_polars/expr/tick/direction.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ffn_polars_spark.core import ColumnOrName, Over, col_name, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="tick", context="series")
@auto_alias("direction")
@guard_input("self", expected_dtype="double")
def tick_rule(self: ColumnOrName, *, over: Over) -> Column:
    """Trade-direction inference: +1 if price > previous, −1 if lower, else 0
    (first row 0 — null comparisons are not true). Reference:
    direction.py:8-24.
    """
    c = to_col(self)
    w = over.w_ordered("tick_rule")
    prev = F.lag(c, 1).over(w)
    return F.when(c > prev, F.lit(1)).when(c < prev, F.lit(-1)).otherwise(F.lit(0))


@register(namespace="tick", context="series")
@guard_input("self", expected_dtype="long")
@guard_input("price", expected_dtype="double")
def apply_tick_rule_to_volume(self: ColumnOrName, price: ColumnOrName, *, over: Over) -> Column:
    """Signed volume: ``volume * tick_rule(price)``.

    No auto-alias — the output keeps the volume column's name, matching the
    reference (direction.py:27-39 has no ``@auto_alias``; Polars arithmetic
    keeps the left operand's root name).
    """
    name = col_name(self)
    result = to_col(self).cast("double") * tick_rule(price, over=over).cast("double")
    return result.alias(name) if name else result


@register(namespace="tick", context="scalar")
@auto_alias("tick_imbalance")
@guard_input("self", expected_dtype="double")
def calc_tick_imbalance(self: ColumnOrName) -> Column:
    """Tick imbalance: ``sum(direction) / row_count`` ∈ [−1, 1]. The
    denominator counts all rows (Polars ``len()``), not just non-nulls.
    Reference: direction.py:42-55."""
    return F.sum(self).cast("double") / F.count(F.lit(1)).cast("double")


@register(namespace="tick", kind="df", context="dataframe", alias="lee_ready")
def lee_ready(
    trades,
    quotes,
    price: str = "price",
    ts: str = "ts_ns",
    by=None,
    ask: str = "ask",
    bid: str = "bid",
):
    """Lee–Ready trade-direction classification: each trade is compared to
    the prevailing quote midpoint (as-of backward join to the latest quote
    at-or-before the trade); above the mid → buy (+1), below → sell (−1),
    at the mid — or before any quote exists — fall back to the tick rule
    on the trade tape itself (direction.py:8-24 semantics: first trade 0).
    The quote-based test is the standard upgrade over the pure tick rule
    (#32) when a quote feed is available.

    Cost: one as-of join (union-tag + last-ignorenulls window, no join
    explosion — operators/asof.py) plus one ordered window for the
    fallback. Returns the trade rows + ``mid`` + ``lr_direction``.
    """
    from pyspark.sql import functions as F

    from ffn_polars_spark.operators.asof import asof_join

    by = [by] if isinstance(by, str) else list(by or [])
    q = quotes.select(
        *by, ts, ((F.col(ask) + F.col(bid)) / F.lit(2.0)).alias("mid")
    )
    joined = asof_join(trades, q, on=ts, by=by or None, strategy="backward")
    over = Over(order_by=[ts], partition_by=by or None)
    fallback = tick_rule(F.col(price), over=over)
    p, m = F.col(price), F.col("mid")
    d = F.when(p > m, F.lit(1)).when(p < m, F.lit(-1)).otherwise(fallback)
    return joined.withColumn("lr_direction", d)
