"""Tick microstructure pipeline on simulated data: simulate a quote tape,
derive trades, compute per-ticker microstructure metrics and bars.

Run: python examples/tick_microstructure.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ffn_polars_spark as ffn
from ffn_polars_spark import Over
from ffn_polars_spark.sources import get_spark


def main() -> None:
    spark = get_spark("tick-example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from ffn_polars_spark.functions.tick_bars import detect_bursts, time_bars
    from ffn_polars_spark.functions.tick_price import calc_realized_volatility
    from ffn_polars_spark.sim import simulate_market

    quotes, raw_trades = simulate_market(
        spark, ["AAPL", "MSFT"], days=1, quote_ticks_per_day=50_000,
        trade_volume_per_day=500_000,
    )
    trades = raw_trades.select(
        "ticker",
        "participant_timestamp",
        "price",
        raw_trades["size"].cast("double").alias("volume"),
    )

    over = Over(partition_by="ticker", order_by="participant_timestamp")

    # Signed volume via the tick rule, then flow metrics per ticker
    signed = trades.withColumn(
        "signed_volume", ffn.tick.apply_tick_rule_to_volume("volume", "price", over=over)
    )
    signed.groupBy("ticker").agg(
        ffn.tick.calc_vwap("price", "volume"),
        ffn.tick.calc_traded_value("price", "volume"),
        ffn.tick.calc_order_flow_imbalance("signed_volume"),
        ffn.tick.calc_trade_rate("participant_timestamp", per="s"),
    ).show()

    # Order-dependent aggregate: realized volatility (two-phase)
    calc_realized_volatility(
        trades, "price", by=["ticker"], order_by="participant_timestamp"
    ).show()

    # One-minute OHLCV bars, then burst detection on the bar grid
    bars = time_bars(
        trades, ts="participant_timestamp", price="price", volume="volume",
        by=["ticker"], bar_ns=60 * 10**9,
    )
    bars.show(5)
    detect_bursts(
        trades, "participant_timestamp", by=["ticker"], bar_ns=60 * 10**9,
        lookback_bars=10, z_threshold=2.5,
    ).where("is_burst").show(5)

    # Cross-ticker return correlations (minute-bucket alignment) and a
    # robust median/MAD screen for fat-fingered prints
    from ffn_polars_spark.operators.sketch import robust_outliers
    from ffn_polars_spark.operators.wide import corr_matrix

    corr_matrix(
        trades, ts_col="participant_timestamp", key_col="ticker",
        price_col="price", bucket_ns=60 * 10**9,
    ).orderBy("key_a", "key_b").show()
    robust_outliers(trades, "price", group_by=["ticker"]).show()

    # Liquidity & toxicity panel: Amihud price impact, Roll implied
    # spread, Kyle lambda, VPIN flow toxicity, and the Corwin-Schultz
    # high-low estimator over hourly bars
    from ffn_polars_spark.functions.tick_bars import corwin_schultz, vpin
    from ffn_polars_spark.functions.tick_price import (
        amihud_illiquidity,
        kyle_lambda,
        roll_spread,
    )

    ob = "participant_timestamp"
    amihud_illiquidity(trades, "price", "volume", by="ticker", order_by=ob).show()
    roll_spread(trades, "price", by="ticker", order_by=ob).show()
    kyle_lambda(trades, "price", "volume", by="ticker", order_by=ob).show()
    vpin(trades, ob, "price", "volume", by=["ticker"]).show()
    hourly = time_bars(
        trades, ts=ob, price="price", volume="volume",
        by=["ticker"], bar_ns=3600 * 10**9,
    )
    corwin_schultz(hourly, by=["ticker"]).show()

    spark.stop()


if __name__ == "__main__":
    main()
