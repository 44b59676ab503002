"""ffn_polars_spark — a PySpark-native portfolio & market-microstructure
analytics engine with the capabilities of rwspielman/ffn-polars.

Reference behavior: /root/reference (studied, not translated — see SURVEY.md).
Every operator is declared through the Spark DataFrame API so Catalyst plans
and distributes it; order-dependent semantics the Polars original gets from
implicit row order are expressed through explicit ``Over(partition_by,
order_by)`` window specs.

Usage mirrors the reference's namespaces, minus Column monkey-patching
(PySpark has no public expression-namespace hook and patching breaks Spark
Connect — reference: ffn_polars/__init__.py:16-76)::

    import ffn_polars_spark as ffn
    from ffn_polars_spark import Over

    df.select(ffn.eod.to_returns("AAPL", over=Over(order_by="Date")))
    df.groupBy("ticker").agg(ffn.tick.calc_vwap("price", "volume"))
"""

from __future__ import annotations

from ffn_polars_spark import registry as _registry
from ffn_polars_spark.config import SCALE, TRADING_DAYS_PER_YEAR
from ffn_polars_spark.core import (
    Over,
    col_name,
    epoch_seconds,
    first_by,
    last_by,
    to_col,
    ts_to_ns,
)
from ffn_polars_spark.utils import GuardMode, set_guard_mode

_registry.import_all_expr_modules()

FFN_REGISTRY = _registry.FFN_REGISTRY
FFN_DF_REGISTRY = _registry.FFN_DF_REGISTRY
FFN_TICK_REGISTRY = _registry.FFN_TICK_REGISTRY
FFN_EOD_REGISTRY = _registry.FFN_EOD_REGISTRY


class _Namespace:
    """Dynamic dispatch over a registry dict — the Spark-side analogue of the
    reference's ``__getattr__``-based Polars namespaces
    (ffn_polars/__init__.py:21-27)."""

    def __init__(self, name: str, *registries: dict):
        self._name = name
        self._registries = registries

    def __getattr__(self, item: str):
        for reg in self._registries:
            if item in reg:
                return reg[item]
        raise AttributeError(f"'{self._name}' namespace has no operator '{item}'")

    def __dir__(self):
        names = set()
        for reg in self._registries:
            names.update(reg.keys())
        return sorted(names)

    @staticmethod
    def extract_all_alias_suffixes():
        return _registry.extract_all_alias_suffixes()


# `ffn.eod` / `ffn.tick` mirror `.ffn_eod` / `.ffn_tick`; `ffn.expr` mirrors
# the combined `.ffn` namespace; `ffn.df` the DataFrame namespace.
eod = _Namespace("eod", FFN_EOD_REGISTRY)
tick = _Namespace("tick", FFN_TICK_REGISTRY)
expr = _Namespace("ffn", FFN_REGISTRY)
df = _Namespace("df", FFN_DF_REGISTRY)


def __getattr__(name: str):
    """Package-level fallback: ``ffn.to_returns`` resolves through the full
    registry, like ``.ffn`` in the reference."""
    if name in FFN_REGISTRY:
        return FFN_REGISTRY[name]
    if name in FFN_DF_REGISTRY:
        return FFN_DF_REGISTRY[name]
    raise AttributeError(f"module 'ffn_polars_spark' has no attribute '{name}'")


__all__ = [
    "Over",
    "GuardMode",
    "set_guard_mode",
    "SCALE",
    "TRADING_DAYS_PER_YEAR",
    "to_col",
    "col_name",
    "ts_to_ns",
    "epoch_seconds",
    "first_by",
    "last_by",
    "eod",
    "tick",
    "expr",
    "df",
    "FFN_REGISTRY",
    "FFN_DF_REGISTRY",
    "FFN_TICK_REGISTRY",
    "FFN_EOD_REGISTRY",
]
