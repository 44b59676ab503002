"""Quote-analytics operators (reference's declared-but-empty quote namespace)
— hand-recomputed expectations, plus a sim-integration check."""

import pytest
from pyspark.sql import functions as F

import ffn_polars_spark as ffn
from ffn_polars_spark.functions.quote import time_weighted_spread

SEC = 1_000_000_000


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        # ts, ask, bid, ask_size, bid_size
        (0 * SEC, 10.2, 10.0, 2.0, 6.0),
        (1 * SEC, 10.4, 10.0, 1.0, 1.0),
        (3 * SEC, 10.1, 9.9, 4.0, 4.0),
    ]
    return spark.createDataFrame(
        rows, ["ts", "ask", "bid", "ask_size", "bid_size"]
    ).cache()


def test_elementwise_quote_ops(quotes):
    r = quotes.orderBy("ts").select(
        ffn.tick.quoted_spread("ask", "bid"),
        ffn.tick.midpoint("ask", "bid"),
        ffn.tick.relative_spread("ask", "bid"),
        ffn.tick.microprice("ask", "bid", "ask_size", "bid_size"),
        ffn.tick.quote_imbalance("bid_size", "ask_size"),
    ).collect()
    assert [c for c in quotes.select(ffn.tick.quoted_spread("ask", "bid")).columns] == [
        "ask_quoted_spread"
    ]
    row = r[0]
    assert abs(row["ask_quoted_spread"] - 0.2) < 1e-12
    assert abs(row["ask_midpoint"] - 10.1) < 1e-12
    assert abs(row["ask_relative_spread"] - 0.2 / 10.1) < 1e-12
    # microprice: (bsz*ask + asz*bid)/(asz+bsz) = (6*10.2 + 2*10.0)/8
    assert abs(row["ask_microprice"] - (6 * 10.2 + 2 * 10.0) / 8) < 1e-12
    assert abs(row["bid_size_quote_imbalance"] - (6 - 2) / 8) < 1e-12


def test_effective_spread(spark):
    df = spark.createDataFrame([(10.05, 10.0, 1), (9.98, 10.0, -1)], ["p", "mid", "d"])
    r = df.select(
        ffn.tick.effective_spread("p", "mid", "d").alias("signed"),
        ffn.tick.effective_spread("p", "mid").alias("unsigned"),
    ).collect()
    assert abs(r[0]["signed"] - 0.1) < 1e-12
    assert abs(r[1]["signed"] - 0.04) < 1e-12
    assert abs(r[1]["unsigned"] - 0.04) < 1e-12


def test_time_weighted_spread(quotes):
    # weights: 1s (spread .2), 2s (spread .4), last dropped
    out = time_weighted_spread(quotes, "ask", "bid", "ts").collect()[0]
    expected = (0.2 * 1 + 0.4 * 2) / 3
    assert abs(out["ask_twa_spread"] - expected) < 1e-12


def test_quote_ops_on_simulated_tape(spark):
    from ffn_polars_spark.sim import simulate_quotes

    q = simulate_quotes(spark, "T", ticks_per_day=2000, seed=5)
    row = q.agg(
        F.avg(ffn.tick.quoted_spread("ask_price", "bid_price")).alias("avg_spread"),
        F.min(ffn.tick.midpoint("ask_price", "bid_price")).alias("min_mid"),
    ).collect()[0]
    assert row["avg_spread"] > 0
    assert row["min_mid"] > 0
    twa = time_weighted_spread(
        q, "ask_price", "bid_price", "participant_timestamp", by=["ticker"]
    ).collect()[0]
    assert twa["ask_price_twa_spread"] == pytest.approx(row["avg_spread"], rel=0.2)
