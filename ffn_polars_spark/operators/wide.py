"""Wide EOD price-table helpers.

The reference's EOD archetype is a WIDE table — one date column plus one
price column per ticker (SURVEY.md §1.2-A; tests run each operator per
ticker column). These helpers make that workflow first-class:

* :func:`apply_to_columns` — run one expression operator over many price
  columns in a single ``select`` (one pass, auto-aliased per column).
* :func:`melt` — wide → long unpivot (ticker, value rows) via ``stack``, the
  layout every grouped/tick operator wants. Pure projection+generator, no
  shuffle; the inverse (:func:`pivot_prices`) is a grouped pivot.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register


@register(kind="df", context="dataframe")
def apply_to_columns(
    df: DataFrame,
    op: Callable[..., Column],
    cols: Sequence[str],
    keep: Optional[Sequence[str]] = None,
    **kwargs,
) -> DataFrame:
    """Apply expression operator ``op`` to every column in ``cols`` in ONE
    projection (one window per distinct Over, shared by all columns).

    Example::

        apply_to_columns(px, ffn.eod.to_returns, ["AAPL", "MSFT", "C"],
                         keep=["Date"], over=Over(order_by="Date"))
    """
    keep = list(keep or [])
    return df.select(*keep, *[op(c, **kwargs) for c in cols])


@register(kind="df", context="dataframe")
def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    key_name: str = "ticker",
    value_name: str = "price",
) -> DataFrame:
    """Wide → long: one row per (id, value column). ``stack`` is a generator
    expression — each input row fans out executor-side, nothing shuffles."""
    id_cols = list(id_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stacked = F.expr(
        f"stack({len(value_cols)}, {pairs}) as ({key_name}, {value_name})"
    )
    return df.select(*id_cols, stacked)


@register(kind="df", context="dataframe")
def pivot_prices(
    df: DataFrame,
    id_col: str,
    key_col: str = "ticker",
    value_col: str = "price",
    keys: Optional[List[str]] = None,
) -> DataFrame:
    """Long → wide: one column per key. Passing ``keys`` explicitly skips the
    extra distinct-keys job and keeps the column order stable."""
    p = df.groupBy(id_col).pivot(key_col, keys)
    return p.agg(F.first(value_col))
