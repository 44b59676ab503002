"""Deterministic bootstrap resampling and the reproducible market simulator.

Two round-5 features:

* the single-pass Poisson bootstrap with engine-portable hash draws — the
  same sample replays on any cluster, any partitioning, or in DuckDB;
* the market simulator's md5 hash-stream mode, which makes a whole
  simulated session reproducible outside Spark.

Run: python examples/bootstrap_and_sim.py [sf_dir]   (default /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffn_polars_spark.sources import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("bootstrap-example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from ffn_polars_spark.operators.resample import (
        resample_returns_hash,
        resample_returns_poisson,
    )

    ev = read_table(spark, sf_dir, "events")
    rets = ev.select(
        "event_id", (F.col("value") / F.lit(1000.0)).alias("r")
    ).where(F.col("r").isNotNull())

    # Scalable path: one distributed pass, all trials at once.  key_col
    # switches the replicate draws to the portable md5 stream — rerun this
    # anywhere (different partitioning, different cluster, or the DuckDB
    # oracle) and every trial reproduces exactly.
    boot = resample_returns_poisson(
        rets,
        {"mean_r": F.avg("r"), "std_r": F.stddev_samp("r")},
        num_trials=200,
        seed=7,
        key_col="event_id",
    )
    print("Poisson bootstrap (first 5 trials):")
    boot.orderBy("trial").show(5)

    # Exact n-of-n semantics (the reference's resample_returns contract),
    # deterministic draws, moderate scale.
    exact = resample_returns_hash(
        rets, {"mean_r": F.avg("r")}, key_col="event_id", num_trials=20, seed=7
    )
    print("exact n-of-n bootstrap (first 5 trials):")
    exact.orderBy("trial").show(5)

    # Reproducible simulated session: hash_fn="md5" makes every draw a pure
    # function of (row id, stream tag, seed) in a portable hash — the
    # correctness gate replays this exact session in DuckDB.
    from ffn_polars_spark.sim import simulate_market

    quotes, trades = simulate_market(
        spark,
        "SIM",
        days=1,
        quote_ticks_per_day=5_000,
        trade_volume_per_day=100_000,
        sort=False,
        hash_fn="md5",
    )
    print("simulated session per tape:")
    trades.groupBy("tape").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("size").alias("shares"),
        F.round(F.sum(F.col("price") * F.col("size")) / F.sum("size"), 4).alias("vwap"),
    ).orderBy("tape").show()

    spark.stop()


if __name__ == "__main__":
    main()
