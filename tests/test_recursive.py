"""EWMA family: parity with pandas ewm(adjust=False), key isolation,
partitioning independence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.operators.recursive import ewm_volatility, ewma


@pytest.fixture(scope="module")
def series(spark):
    rows = []
    rng = np.random.RandomState(3)
    for key in ("A", "B"):
        for i in range(200):
            rows.append((key, i, float(100 + rng.randn())))
    return spark.createDataFrame(rows, ["k", "t", "x"])


def test_ewma_matches_pandas(spark, series):
    out = ewma(series, "x", 0.06, "t", by=["k"]).toPandas()
    pdf = series.toPandas()
    for key in ("A", "B"):
        got = (
            out[out.k == key].sort_values("t")["x_ewma"].to_numpy()
        )
        want = (
            pdf[pdf.k == key]
            .sort_values("t")["x"]
            .ewm(alpha=0.06, adjust=False)
            .mean()
            .to_numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ewma_partitioning_independent(spark, series):
    a = ewma(series.repartition(7), "x", 0.1, "t", by=["k"]).collect()
    b = ewma(series.coalesce(1), "x", 0.1, "t", by=["k"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ewma_global_no_keys(spark):
    df = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 3.0)], ["t", "x"])
    out = {r.t: r.x_ewma for r in ewma(df, "x", 0.5, "t").collect()}
    assert out[0] == 1.0 and out[1] == 1.5 and out[2] == 2.25


def test_ewm_volatility_riskmetrics(spark):
    df = spark.createDataFrame(
        [("A", 0, 0.02), ("A", 1, -0.01), ("A", 2, 0.03)], ["k", "t", "r"]
    )
    out = {r.t: r.r_ewmvol for r in
           ewm_volatility(df, "r", 0.06, "t", by=["k"]).collect()}
    v0 = 0.02 * 0.02
    v1 = 0.94 * v0 + 0.06 * 0.01 * 0.01
    v2 = 0.94 * v1 + 0.06 * 0.03 * 0.03
    assert out[0] == pytest.approx(np.sqrt(v0), rel=1e-12)
    assert out[2] == pytest.approx(np.sqrt(v2), rel=1e-12)


def test_drawdown_details_episodes(spark):
    from ffn_polars_spark.functions.eod_risk import drawdown_details

    # peaks at 100 (t0), recovery to 110 (t3), then an open drawdown
    prices = [100.0, 90.0, 80.0, 110.0, 105.0, 99.0]
    df = spark.createDataFrame(list(enumerate(prices)), ["t", "p"])
    eps = {r.episode: r for r in drawdown_details(df, "p", order_by="t").collect()}
    assert len(eps) == 2
    # episode 1: t1-t2, trough t2 at 80/100-1 = -0.2
    assert (eps[1].start_d, eps[1].trough_d, eps[1].end_d) == (1, 2, 2)
    assert eps[1].depth == -0.2 and eps[1].n_obs == 2
    # episode 2 (open): t4-t5, trough t5 at 99/110-1 = -0.1
    assert (eps[2].start_d, eps[2].end_d) == (4, 5)
    assert eps[2].depth == -0.1 and eps[2].trough_d == 5


def test_drawdown_details_grouped(spark):
    from ffn_polars_spark.functions.eod_risk import drawdown_details

    rows = [("A", 0, 10.0), ("A", 1, 9.0), ("A", 2, 11.0),
            ("B", 0, 5.0), ("B", 1, 5.5)]
    df = spark.createDataFrame(rows, ["k", "t", "p"])
    out = drawdown_details(df, "p", order_by="t", by=["k"]).collect()
    assert {(r.k, r.episode) for r in out} == {("A", 1)}  # B never draws down


def test_monthly_returns_compounding(spark):
    from ffn_polars_spark.functions.eod_returns import monthly_returns
    import datetime as dt

    rows = [
        (dt.date(2024, 1, 2), 100.0), (dt.date(2024, 1, 31), 110.0),
        (dt.date(2024, 2, 15), 99.0),
        (dt.date(2024, 3, 1), 132.0),
    ]
    df = spark.createDataFrame(rows, ["Date", "p"])
    out = {(r.year, r.month): r.month_return
           for r in monthly_returns(df, "p").collect()}
    assert out[(2024, 1)] == pytest.approx(0.1)      # first month: end/first - 1
    assert out[(2024, 2)] == pytest.approx(-0.1)     # 99/110 - 1
    assert out[(2024, 3)] == pytest.approx(132.0 / 99.0 - 1, abs=1e-6)
