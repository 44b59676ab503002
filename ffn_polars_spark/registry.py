"""Operator registry.

Same registry pattern as the reference (/root/reference/ffn_polars/registry.py:5-48):
a flat dict of every expression operator plus per-namespace dicts, populated by a
``@register`` decorator that supports multiple aliases. Consumers reach operators
either as plain module functions (``from ffn_polars_spark.functions import
eod_returns``) or dynamically through the package-level namespaces
(``ffn_polars_spark.eod.to_returns``), which dispatch through these dicts exactly
like the reference's ``__getattr__``-based Polars namespaces
(/root/reference/ffn_polars/__init__.py:16-76).

Unlike the reference we do NOT monkey-patch the Column class: PySpark has no public
expression-namespace registration API and patching ``pyspark.sql.Column`` breaks
Spark Connect. Functions take the column (name or Column) as their first argument.
"""

from __future__ import annotations

import importlib
import pkgutil
from collections.abc import Iterable

FFN_REGISTRY: dict = {}
FFN_DF_REGISTRY: dict = {}
FFN_TICK_REGISTRY: dict = {}
FFN_EOD_REGISTRY: dict = {}

# Operator execution contexts (SURVEY.md §2 "Context" column):
#   elementwise - length-preserving, order-independent
#   series      - length-preserving, order-dependent (requires Over(order_by=...))
#   scalar      - aggregation, usable inside groupBy().agg(...)
#   dataframe   - DataFrame -> DataFrame (two-phase window+agg, bootstrap, joins)
CONTEXTS = ("elementwise", "series", "scalar", "dataframe")


def register(namespace: str = "tick", kind: str = "expr", alias=None, context: str = "series"):
    """Insert the decorated function into the registries under one or more names."""
    if context not in CONTEXTS:
        raise ValueError(f"Unsupported context: {context}")

    def decorator(func):
        aliases = (
            alias
            if isinstance(alias, Iterable) and not isinstance(alias, str)
            else [alias or func.__name__]
        )
        func._ffn_context = context
        func._ffn_namespace = namespace
        for name in aliases:
            if kind == "expr":
                FFN_REGISTRY[name] = func
                if namespace == "tick":
                    FFN_TICK_REGISTRY[name] = func
                elif namespace == "eod":
                    FFN_EOD_REGISTRY[name] = func
            elif kind == "df":
                FFN_DF_REGISTRY[name] = func
            else:
                raise ValueError(f"Unsupported kind: {kind}")
        return func

    return decorator


def extract_all_alias_suffixes() -> set[str]:
    """All auto-alias suffixes known to the registry.

    Used by ``auto_alias`` to strip a previously auto-added suffix before
    appending a new one (reference: utils/decorators.py:16-25,
    __init__.py:30-38).
    """
    suffixes = set()
    for fn in list(FFN_REGISTRY.values()) + list(FFN_DF_REGISTRY.values()):
        sfx = getattr(fn, "_alias_suffix", None)
        if sfx:
            suffixes.add(sfx)
    return suffixes


def import_all_modules_in(*packages) -> None:
    for pkg in packages:
        for _, modname, ispkg in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            if not ispkg:
                importlib.import_module(modname)


def import_all_expr_modules() -> None:
    """Import every functions/operators module so ``@register`` decorators fire."""
    import ffn_polars_spark.functions as _functions
    import ffn_polars_spark.operators as _operators

    import_all_modules_in(_functions, _operators)
