"""Distributed trade-tape simulator.

Behavioral parity: /root/reference/ffn_polars/sim/trades.py:8-98 — trade
times sampled (with replacement) from the quote tape, direction ±1, price /
size / exchange looked up from the prevailing quote on the traded side,
burst-doubled sizes clipped to [1, 10] lots × 100 shares, Polygon-style
trade schema.

The reference does the quote lookup with ``np.interp`` over the full quote
arrays on one machine. Because trade timestamps are drawn *from* the quote
timestamps, linear interpolation evaluated at a node returns that node's
value — so the lookup is exactly an equi-join back to the sampled quote row.
We therefore sample quote ROWS directly (one distributed join, no
materialized driver arrays). For trade times that do NOT coincide with quote
ticks (e.g. a plugin rewrote timestamps), ``operators.asof.interp_asof_join``
is the faithful np.interp equivalent — used when ``interpolate=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ffn_polars_spark.sim.common import assign_tape, get_trading_window_ns
from ffn_polars_spark.sim.events import day_burst_windows, within_events


def simulate_trades(
    spark: SparkSession,
    ticker: str,
    quotes: DataFrame,
    day_index: int = 0,
    target_volume: int = 10_000_000,
    avg_trade_size: int = 100,
    seed: int = 42,
    interpolate: bool = False,
    hash_fn: str = "xxhash64",
    n_quotes: int | None = None,
) -> DataFrame:
    """One trading day of prints for ``ticker`` against its quote tape.

    Pass ``n_quotes`` when the caller already knows the tape length (the
    simulator always does): it skips a ``count()`` that would otherwise
    re-execute the whole quote-generation plan just to size the sampler."""
    import functools

    from ffn_polars_spark.sim import rand as _r

    randint = functools.partial(_r.randint, hash_fn=hash_fn)
    uniform = functools.partial(_r.uniform, hash_fn=hash_fn)

    day_seed = seed + day_index
    n_trades = int(target_volume / avg_trade_size)
    if n_quotes is None:
        n_quotes = quotes.count()

    rid = F.col("id")
    trades = spark.range(n_trades).select(
        rid.alias("id"),
        # Sample a quote row index uniformly with replacement (trades.py:32).
        randint(rid, "pick", day_seed, 0, n_quotes).alias("__qidx"),
        F.when(uniform(rid, "dir", day_seed) < 0.5, F.lit(-1))
        .otherwise(F.lit(1))
        .alias("__dir"),
    )

    qcols = [
        "participant_timestamp",
        "ask_price",
        "bid_price",
        "ask_size",
        "bid_size",
        "ask_exchange",
        "bid_exchange",
    ]
    q = _indexed_quotes(quotes, qcols)

    if interpolate:
        # Faithful np.interp path: keep only the sampled timestamp, then
        # linearly interpolate every quote field at that instant.
        from ffn_polars_spark.operators.asof import interp_asof_join

        sampled_ts = trades.join(
            q.select("__qidx", F.col("participant_timestamp").alias("__ts")), "__qidx"
        ).select("id", "__dir", F.col("__ts").alias("participant_timestamp"))
        t = interp_asof_join(
            sampled_ts,
            quotes.select(*qcols),
            on="participant_timestamp",
            value_cols=[c for c in qcols if c != "participant_timestamp"],
        )
    else:
        t = trades.join(q, "__qidx")

    start_ns, end_ns = get_trading_window_ns(day_index)
    bursts = day_burst_windows(start_ns, end_ns, day_index, seed)
    in_burst = within_events(F.col("participant_timestamp"), bursts)

    buy = F.col("__dir") == 1
    price = F.round(F.when(buy, F.col("ask_price")).otherwise(F.col("bid_price")), 2)
    lots = F.when(buy, F.col("ask_size")).otherwise(F.col("bid_size")).cast("double")
    lots = lots * F.when(in_burst, F.lit(2.0)).otherwise(F.lit(1.0))
    size = (
        F.least(F.greatest(lots, F.lit(1.0)), F.lit(10.0)) * F.lit(100)
    ).cast("long")
    exchange = (
        F.when(buy, F.col("ask_exchange")).otherwise(F.col("bid_exchange")).cast("int")
    )

    return t.select(
        F.lit(ticker).alias("ticker"),
        F.lit("0").alias("conditions"),
        F.lit(None).cast("string").alias("correction"),
        exchange.alias("exchange"),
        (F.lit(1_000_000) + rid).alias("id"),
        F.col("participant_timestamp"),
        price.alias("price"),
        (F.lit(2_000_000) + rid).alias("sequence_number"),
        (
            F.col("participant_timestamp") + randint(rid, "sip", day_seed, 5_000, 200_000)
        ).alias("sip_timestamp"),
        size.alias("size"),
        assign_tape(exchange, rid, "tape", day_seed, hash_fn=hash_fn).alias("tape"),
        randint(rid, "trf", day_seed, 0, 3).cast("int").alias("trf_id"),
        (
            F.col("participant_timestamp") + randint(rid, "trft", day_seed, 10_000, 400_000)
        ).alias("trf_timestamp"),
    )


def _indexed_quotes(quotes: DataFrame, cols) -> DataFrame:
    """Quotes with a dense 0-based ``__qidx`` in timestamp order.

    ``zipWithIndex`` would leave the DataFrame API; instead use row_number
    over the timestamp order. For a single day/ticker tape this is one sort;
    multi-ticker callers should loop per ticker (matching the reference's
    per-ticker generation, sim/__init__.py:33-47).
    """
    from pyspark.sql import Window

    w = Window.orderBy("participant_timestamp", "sequence_number")
    return quotes.select(*cols, "sequence_number").withColumn(
        "__qidx", F.row_number().over(w) - 1
    ).drop("sequence_number")
