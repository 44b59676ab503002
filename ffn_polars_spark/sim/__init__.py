"""Market-microstructure data simulator (SURVEY.md §2.10).

Parity target: /root/reference/ffn_polars/sim/__init__.py:20-54 — per-day
quotes -> quote plugins -> trades -> trade plugins, concatenated and sorted
by participant_timestamp. Here each day is a lazy Spark plan; days are
unioned and the final sort is a single distributed range-partitioned sort.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from ffn_polars_spark.sim.plugins.registry import PLUGIN_REGISTRY
from ffn_polars_spark.sim.preview import preview_plugin_effect
from ffn_polars_spark.sim.quotes import simulate_quotes, simulate_quotes_exact
from ffn_polars_spark.sim.trades import simulate_trades

__all__ = [
    "simulate_quotes",
    "simulate_quotes_exact",
    "simulate_trades",
    "simulate_market",
    "apply_plugins",
    "preview_plugin_effect",
    "PLUGIN_REGISTRY",
]


def apply_plugins(df: DataFrame, plugins: List[dict], plugin_type: str) -> DataFrame:
    """Apply each registered plugin of ``plugin_type`` in order
    (reference: sim/__init__.py:10-17)."""
    for p in plugins:
        plugin = PLUGIN_REGISTRY.get(p["name"])
        if plugin and plugin.type == plugin_type:
            df = plugin.apply(df, params=p.get("params", {}))
    return df


def simulate_market(
    spark: SparkSession,
    ticker,
    days: int = 1,
    quote_ticks_per_day: int = 500_000,
    trade_volume_per_day: int = 10_000_000,
    seed: int = 42,
    plugins: Optional[List[dict]] = None,
    sort: bool = True,
    hash_fn: str = "xxhash64",
) -> Tuple[DataFrame, DataFrame]:
    """(quotes, trades) over ``days`` sessions (reference defaults:
    500k quote ticks and 10M traded shares per day, sim/__init__.py:23-24).

    ``ticker`` may be one symbol or a list — multi-ticker tapes union the
    per-ticker plans (each ticker draws an independent seeded stream, so the
    union parallelizes with no cross-ticker coupling)."""
    plugins = plugins or []
    tickers = [ticker] if isinstance(ticker, str) else list(ticker)

    quotes_days, trades_days = [], []
    for t_idx, tkr in enumerate(tickers):
        for day in range(days):
            quotes = simulate_quotes(
                spark,
                ticker=tkr,
                day_index=day,
                ticks_per_day=quote_ticks_per_day,
                seed=seed + 1_000_003 * t_idx,
                hash_fn=hash_fn,
            )
            quotes = apply_plugins(quotes, plugins, "quotes")

            trades = simulate_trades(
                spark,
                ticker=tkr,
                quotes=quotes,
                day_index=day,
                target_volume=trade_volume_per_day,
                seed=seed + 1_000_003 * t_idx,
                hash_fn=hash_fn,
                # plugins may drop/alter quote rows; only skip the sizing
                # count when the tape is the generator's verbatim output
                n_quotes=quote_ticks_per_day if not plugins else None,
            )
            trades = apply_plugins(trades, plugins, "trades")

            quotes_days.append(quotes)
            trades_days.append(trades)

    all_quotes, all_trades = quotes_days[0], trades_days[0]
    for q in quotes_days[1:]:
        all_quotes = all_quotes.unionByName(q)
    for t in trades_days[1:]:
        all_trades = all_trades.unionByName(t)

    if sort:
        all_quotes = all_quotes.orderBy("participant_timestamp")
        all_trades = all_trades.orderBy("participant_timestamp")
    return all_quotes, all_trades
