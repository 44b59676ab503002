"""Example quotes plugin: widen spreads inside a time window.

The reference ships the plugin *protocol* with no concrete plugins
(SURVEY.md §2.10); this one demonstrates the contract and exercises the
registry in tests. Pure Column arithmetic — the widening folds into the
quote-generation plan, no extra pass.

Params:
    factor (float, default 2.0): multiply the ask-bid spread by this.
    start_ns / end_ns (int, optional): restrict to [start_ns, end_ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

name = "widen_spreads"
type = "quotes"


def apply(df: DataFrame, *, params: dict) -> DataFrame:
    factor = float(params.get("factor", 2.0))
    start_ns = params.get("start_ns")
    end_ns = params.get("end_ns")
    in_window = F.lit(True)
    if start_ns is not None:
        in_window = in_window & (F.col("participant_timestamp") >= F.lit(int(start_ns)))
    if end_ns is not None:
        in_window = in_window & (F.col("participant_timestamp") < F.lit(int(end_ns)))
    spread = F.col("ask_price") - F.col("bid_price")
    widened = F.round(F.col("bid_price") + spread * F.lit(factor), 2)
    return df.withColumn(
        "ask_price", F.when(in_window, widened).otherwise(F.col("ask_price"))
    )
