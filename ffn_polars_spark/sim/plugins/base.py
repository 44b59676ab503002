"""Microstructure plugin protocol.

Parity: /root/reference/ffn_polars/sim/plugins/base.py:7-11 — a plugin is
anything with ``name``, ``type`` ("quotes" | "trades"), and
``apply(df, params) -> DataFrame``, here over Spark DataFrames. Plugins
compose lazily: ``apply`` should return a transformed DataFrame (more plan),
never collect.
"""

from __future__ import annotations

from typing import Literal, Protocol, runtime_checkable

from pyspark.sql import DataFrame

PluginType = Literal["quotes", "trades"]


@runtime_checkable
class MicrostructurePlugin(Protocol):
    name: str
    type: PluginType

    def apply(self, df: DataFrame, *, params: dict) -> DataFrame: ...
