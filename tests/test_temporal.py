"""Frequency-inference ladder tests across units + irregular-series nulls
(reference test_expr_core.py:132-175, 529-565)."""

import datetime

import pytest

from ffn_polars_spark.functions.eod_temporal import infer_freq, infer_nperiods


def _frame(spark, deltas_seconds, n=10):
    base = datetime.datetime(2020, 1, 1)
    ts, t = [], base
    for i in range(n):
        ts.append((t,))
        t = t + datetime.timedelta(seconds=deltas_seconds)
    return spark.createDataFrame(ts, ["d"])


@pytest.mark.parametrize(
    "delta_s,expected",
    [
        (86400, 252),  # daily
        (7 * 86400, 52),  # weekly
        (30 * 86400, 12),  # monthly
        (91 * 86400, 4),  # quarterly
        (365 * 86400, 1),  # yearly
        (3600, 252 * 24),  # hourly
        (60, 252 * 24 * 60),  # minutely
        (1, 252 * 24 * 3600),  # secondly
    ],
)
def test_infer_nperiods_ladder(spark, delta_s, expected):
    df = _frame(spark, delta_s)
    out = infer_nperiods(df, "d").collect()[0]
    assert out["d_nperiods"] == expected


def test_infer_nperiods_subsecond(spark):
    df = _frame(spark, 0.1)  # 100ms -> round(252*86400/0.1)
    out = infer_nperiods(df, "d").collect()[0]
    assert out["d_nperiods"] == round(252 * 86400 / 0.1)


def test_infer_nperiods_irregular_null(spark):
    base = datetime.datetime(2020, 1, 1)
    days = [0, 1, 6, 26, 55]
    df = spark.createDataFrame(
        [(base + datetime.timedelta(days=d),) for d in days], ["d"]
    )
    out = infer_nperiods(df, "d").collect()[0]
    assert out["d_nperiods"] is None


@pytest.mark.parametrize(
    "delta_s,expected",
    [
        (86400, "daily"),
        (7 * 86400, "weekly"),
        (30 * 86400, "monthly"),
        (91 * 86400, "quarterly"),
        (365 * 86400, "yearly"),
        (3600, "unknown"),
    ],
)
def test_infer_freq_ladder(spark, delta_s, expected):
    df = _frame(spark, delta_s)
    out = infer_freq(df, "d").collect()[0]
    assert out["d_inferred_freq"] == expected


def test_infer_freq_irregular_unknown(spark):
    base = datetime.datetime(2020, 1, 1)
    fib = [0, 1, 2, 4, 7, 12, 20]
    df = spark.createDataFrame(
        [(base + datetime.timedelta(days=d),) for d in fib], ["d"]
    )
    out = infer_freq(df, "d").collect()[0]
    assert out["d_inferred_freq"] == "unknown"


def test_grouped_inference(spark):
    base = datetime.datetime(2020, 1, 1)
    rows = []
    for i in range(8):
        rows.append(("daily", base + datetime.timedelta(days=i)))
        rows.append(("weekly", base + datetime.timedelta(days=7 * i)))
    df = spark.createDataFrame(rows, ["k", "d"])
    out = {r["k"]: r["d_inferred_freq"] for r in infer_freq(df, "d", by=["k"]).collect()}
    assert out == {"daily": "daily", "weekly": "weekly"}


def test_deannualize_annualize_roundtrip(spark):
    import ffn_polars_spark as ffn
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0.10,)], ["r"])
    out = df.select(
        ffn.eod.deannualize("r", n=252).alias("p")
    ).select(ffn.eod.annualize("p", F.lit(1.0).alias("durations"), one_year=252.0)).collect()[0]
    assert abs(out[0] - 0.10) < 1e-12
