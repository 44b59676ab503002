"""Physical-plan inspection.

The reference delegates all optimization to the Polars engine (SURVEY.md §4);
on Spark, Catalyst does that — but only if operators are declared so its
rules apply. This module turns the scale checklist (filters reach the scan,
columns pruned, small dims broadcast, no redundant exchanges) into
assertable properties used by tests/test_plans.py, so a regression that
breaks pushdown or adds a shuffle fails CI instead of surfacing as a 100 TB
slowdown.
"""

from __future__ import annotations

import contextlib
import io
import re
from typing import Dict, List

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the physical plan, counted from the formatted
    node list (reused exchanges don't re-shuffle and aren't counted;
    broadcast exchanges are counted separately — they ship a small table,
    not a data-sized shuffle)."""
    plan = explain_str(df)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    return sum(1 for x in nodes if x == "Exchange")


def count_broadcast_joins(df: DataFrame) -> int:
    plan = explain_str(df)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    return sum(1 for x in nodes if x in ("BroadcastHashJoin", "BroadcastNestedLoopJoin"))


def pushed_filters(df: DataFrame) -> List[str]:
    """Every PushedFilters list that reaches a scan node."""
    return [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
        if m.group(1).strip()
    ]


def read_schemas(df: DataFrame) -> List[str]:
    """ReadSchema struct strings of every file scan (column-pruning check)."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", explain_str(df))]


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count.

    Under AQE the pre-execution plan is an unfinalized AdaptiveSparkPlan with
    no codegen annotation, so the plan is re-derived once with AQE disabled
    (analysis-only; nothing executes) purely to read the codegen structure.
    """
    import uuid

    spark = df.sparkSession
    name = "__plan_probe_" + uuid.uuid4().hex[:12]
    df.createOrReplaceTempView(name)
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = explain_str(spark.table(name), mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
        spark.catalog.dropTempView(name)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def plan_report(df: DataFrame) -> Dict[str, object]:
    """One-call summary used when iterating on an operator's plan."""
    return {
        "exchanges": count_exchanges(df),
        "broadcast_joins": count_broadcast_joins(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "codegen_stages": codegen_stage_count(df),
    }
