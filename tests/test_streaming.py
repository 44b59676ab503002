"""Structured Streaming twins: bounded streams drained with availableNow must
reproduce the batch operators' results exactly."""

import os

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.streaming import (
    read_tick_stream,
    run_available_now,
    stateful_running_vwap,
    streaming_session_stats,
    streaming_time_bars,
    streaming_vwap,
)

SEC = 1_000_000_000


@pytest.fixture(scope="module")
def tick_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tickstream"))
    rows = []
    for i in range(600):
        ticker = "A" if i % 2 == 0 else "B"
        rows.append((ticker, i * SEC, 100.0 + (i % 7), float(1 + i % 3)))
    df = spark.createDataFrame(rows, ["ticker", "ts", "price", "volume"])
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streaming_time_bars_match_batch(spark, tick_dir):
    stream = read_tick_stream(spark, tick_dir, ts_col="ts")
    bars = streaming_time_bars(stream, "price", "volume", by=["ticker"], bar="1 minute")
    got = {
        (r["ticker"], r["bar_start"]): r
        for r in run_available_now(bars).collect()
    }
    # batch twin on the same data
    batch = (
        spark.read.parquet(tick_dir)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("event_time", "1 minute").alias("bar"), "ticker")
        .agg(
            F.min(F.struct(F.col("event_time").alias("k"), F.col("price").alias("v")))
            .getField("v").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("volume").cast("double").alias("volume"),
        )
    )
    want = {(r["ticker"], r["bar"]["start"]): r for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        for c in ["open", "high", "low", "n_ticks", "volume"]:
            assert got[k][c] == want[k][c], (k, c)


def test_streaming_vwap(spark, tick_dir):
    stream = read_tick_stream(spark, tick_dir, ts_col="ts")
    out = run_available_now(
        streaming_vwap(stream, "price", "volume", by=["ticker"], bar="10 minutes")
    )
    row = out.where(
        (F.col("ticker") == "A") & (F.col("bar_start") == F.lit("1970-01-01 00:00:00").cast("timestamp"))
    ).collect()
    assert len(row) == 1
    batch = (
        spark.read.parquet(tick_dir)
        .where((F.col("ticker") == "A") & (F.col("ts") < 600 * SEC))
        .agg((F.sum(F.col("price") * F.col("volume")) / F.sum("volume")).alias("v"))
        .collect()[0]["v"]
    )
    assert abs(row[0]["price_vwap"] - batch) < 1e-9


def test_streaming_session_stats(spark, tmp_path):
    d = str(tmp_path / "sess")
    rows = [
        ("u1", 0), ("u1", 60 * SEC), ("u1", 4000 * SEC),  # 2 sessions
        ("u2", 0),
    ]
    spark.createDataFrame(rows, ["user_id", "ts"]).write.parquet(d)
    stream = read_tick_stream(spark, d, ts_col="ts")
    out = run_available_now(
        streaming_session_stats(stream, "user_id", gap="30 minutes")
    ).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user["u1"]) == [1, 2]
    assert per_user["u2"] == [1]


def test_stateful_running_vwap(spark, tick_dir):
    stream = read_tick_stream(spark, tick_dir, ts_col="ts")
    out = run_available_now(
        stateful_running_vwap(stream, "ticker", "price", "volume"),
        output_mode="update",
    )
    rows = {r["ticker"]: r for r in out.collect()}
    batch = {
        r["ticker"]: r
        for r in spark.read.parquet(tick_dir)
        .groupBy("ticker")
        .agg(
            F.sum("volume").cast("double").alias("v"),
            (F.sum(F.col("price") * F.col("volume")) / F.sum("volume")).alias("w"),
        )
        .collect()
    }
    for t in ("A", "B"):
        assert rows[t]["cum_volume"] == batch[t]["v"]
        assert abs(rows[t]["running_vwap"] - batch[t]["w"]) < 1e-9
