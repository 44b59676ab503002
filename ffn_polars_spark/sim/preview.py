"""Plugin before/after inspectors.

Parity: /root/reference/ffn_polars/sim/utils/preview.py:11-74 — run a plugin
on a frame and report shape change, per-column numeric mean deltas, and
added/removed/retyped columns. Spark version: metrics come from ONE
aggregate job per side (count + all numeric means together), not a
per-column loop of actions.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType

from ffn_polars_spark.sim.plugins.registry import PLUGIN_REGISTRY

InspectorFn = Callable[[DataFrame, DataFrame], None]

_NUMERIC = (DoubleType, FloatType, IntegerType, LongType)


def _profile(df: DataFrame) -> dict:
    """count + numeric means in a single job."""
    num_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)]
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.avg(c).alias(c) for c in num_cols
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    return {"n": row.pop("__n"), "means": row}


def summary_diff(before: DataFrame, after: DataFrame) -> None:
    pb, pa = _profile(before), _profile(after)
    print("Shape change:")
    print(f"  rows: {pb['n']} -> {pa['n']}")
    print(f"  cols: {len(before.columns)} -> {len(after.columns)}")


def numeric_change(before: DataFrame, after: DataFrame) -> None:
    pb, pa = _profile(before), _profile(after)
    print("Numeric column mean change:")
    for col, b in pb["means"].items():
        a = pa["means"].get(col)
        if a is None or b is None:
            continue
        pct = (a - b) / b * 100 if b else 0.0
        print(f"  {col:<24} d={a - b:.5f} ({pct:+.2f}%)")


def column_changes(before: DataFrame, after: DataFrame) -> None:
    tb = {f.name: f.dataType for f in before.schema.fields}
    ta = {f.name: f.dataType for f in after.schema.fields}
    added = sorted(set(ta) - set(tb))
    removed = sorted(set(tb) - set(ta))
    retyped = sorted(c for c in set(tb) & set(ta) if tb[c] != ta[c])
    print("Column differences:")
    if added:
        print(f"  added: {added}")
    if removed:
        print(f"  removed: {removed}")
    if retyped:
        print(f"  retyped: {retyped}")
    if not (added or removed or retyped):
        print("  none")


def preview_plugin_effect(
    df: DataFrame,
    plugin_name: str,
    *,
    params: Optional[dict] = None,
    inspectors: Optional[List[InspectorFn]] = None,
) -> None:
    """Print a before/after diff of applying one plugin to ``df``."""
    params = params or {}
    inspectors = inspectors or [summary_diff, numeric_change, column_changes]

    plugin = PLUGIN_REGISTRY.get(plugin_name)
    if plugin is None:
        print(f"Plugin '{plugin_name}' not found.")
        return

    after = plugin.apply(df, params=params)
    print(f"Plugin: {plugin_name} (type={plugin.type}) params={params}")
    print(f"Description: {(plugin.__doc__ or 'No docstring').strip().splitlines()[0]}")
    for inspect in inspectors:
        print("-" * 40)
        inspect(df, after)
