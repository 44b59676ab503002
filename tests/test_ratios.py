"""Ratio-operator tests with manually recomputed expectations and the
reference's error contracts (SURVEY.md §5 pattern 2)."""

import math
import statistics

import pytest
from pyspark.sql import functions as F

import ffn_polars_spark as ffn

from conftest import aae

RETURNS = [0.01, 0.02, -0.01, 0.005, 0.015]
BENCH = [0.008, 0.018, -0.012, 0.004, 0.012]


@pytest.fixture(scope="module")
def retdf(spark):
    return spark.createDataFrame(
        [(r, b) for r, b in zip(RETURNS, BENCH)], ["r", "b"]
    )


def test_sharpe(spark, retdf):
    out = retdf.groupBy().agg(ffn.eod.calc_sharpe("r", rf=0.0, n=252)).collect()[0]
    expected = statistics.mean(RETURNS) / statistics.stdev(RETURNS) * math.sqrt(252)
    aae(out["r_sharpe"], expected, places=9)


def test_sharpe_rf_column_and_no_annualize(spark, retdf):
    df = retdf.withColumn("rf", F.lit(0.001))
    out = df.groupBy().agg(ffn.eod.calc_sharpe("r", rf="rf", n=252, annualize=False)).collect()[0]
    ex = [r - 0.001 for r in RETURNS]
    aae(out["r_sharpe"], statistics.mean(ex) / statistics.stdev(ex), places=9)


def test_sortino(spark, retdf):
    out = retdf.groupBy().agg(ffn.eod.sortino_ratio("r", rf=0.0, n=252)).collect()[0]
    downside = [min(r, 0.0) for r in RETURNS]
    expected = statistics.mean(RETURNS) / statistics.stdev(downside) * math.sqrt(252)
    aae(out["r_sortino_ratio"], expected, places=9)


def test_sortino_zero_downside_null(spark):
    df = spark.createDataFrame([(0.01,), (0.02,)], ["r"])
    out = df.groupBy().agg(ffn.eod.sortino_ratio("r")).collect()[0]
    assert out["r_sortino_ratio"] is None  # downside std == 0 -> null


def test_information_ratio(spark, retdf):
    out = retdf.groupBy().agg(ffn.eod.calc_information_ratio("r", "b")).collect()[0]
    d = [r - b for r, b in zip(RETURNS, BENCH)]
    aae(out["r_ir"], statistics.mean(d) / statistics.stdev(d), places=9)


def test_information_ratio_null_to_zero(spark):
    df = spark.createDataFrame([(0.01, 0.01)], ["r", "b"])  # one row -> std null
    out = df.groupBy().agg(ffn.eod.calc_information_ratio("r", "b")).collect()[0]
    aae(out["r_ir"], 0.0, places=9)


def test_risk_return_ratio_is_sharpe0(spark, retdf):
    out = retdf.groupBy().agg(
        ffn.eod.calc_risk_return_ratio("r"), ffn.eod.calc_sharpe("r")
    ).collect()[0]
    assert out["r_risk_return_ratio"] == out["r_sharpe"]


def test_prob_mom(spark, retdf):
    from ffn_polars_spark.functions.eod_ratios import calc_prob_mom, prob_mom_cdf

    out = calc_prob_mom(retdf, "r", "b").collect()[0]
    d = [r - b for r, b in zip(RETURNS, BENCH)]
    ir = statistics.mean(d) / statistics.stdev(d)
    expected = prob_mom_cdf(ir, len(d))
    aae(out["r_prob_mom"], expected, places=9)
    # null contract: n < 2 -> None (reference src/lib.rs:26-33)
    assert prob_mom_cdf(1.0, 1) is None
    assert prob_mom_cdf(None, 10) is None


def test_prob_mom_tcdf_matches_scipy_or_table():
    from ffn_polars_spark.functions.eod_ratios import _student_t_cdf

    # pinned values (scipy.stats.t.cdf reference)
    aae(float(_student_t_cdf(1.0, 4)), 0.8130495168, places=8)
    aae(float(_student_t_cdf(0.0, 7)), 0.5, places=9)
    aae(float(_student_t_cdf(-2.0, 10)), 0.0366940174, places=8)
    # exact closed form: t.cdf(-0.5, 2) == 1/3
    aae(float(_student_t_cdf(-0.5, 2)), 1.0 / 3.0, places=9)


def test_excess_returns_type_error():
    with pytest.raises(TypeError):
        ffn.eod.to_excess_returns("r", rf=[0.01], n=252)


def test_upi_contracts(spark, retdf):
    from ffn_polars_spark.functions.eod_risk import ulcer_performance_index

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate([100.0, 90.0, 95.0, 85.0, 80.0])], ["t", "p"]
    )
    with pytest.raises(ValueError, match="nperiods"):
        ulcer_performance_index(df, "p", rf=0.05, order_by="t")
    with pytest.raises(TypeError):
        ulcer_performance_index(df, "p", rf=[1], order_by="t")


def test_ulcer_index_known_example(spark):
    # reference tests/expr/test_expr_core.py:410-421 price path
    prices = [100.0, 90.0, 95.0, 85.0, 80.0]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(prices)], ["t", "p"])
    from ffn_polars_spark.functions.eod_risk import ulcer_index

    out = ulcer_index(df, "p", order_by="t").collect()[0]
    cummax = [100.0, 100.0, 100.0, 100.0, 100.0]
    dd = [(p - m) / m * 100 for p, m in zip(prices, cummax)]
    expected = math.sqrt(sum(x * x for x in dd) / len(dd))
    aae(out["p_ulcer_index"], expected, places=9)


def test_calmar(spark):
    import datetime

    prices = [100.0, 120.0, 90.0, 130.0]
    base = datetime.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [(base + datetime.timedelta(days=365 * i), p) for i, p in enumerate(prices)],
        ["d", "p"],
    )
    from ffn_polars_spark.functions.eod_ratios import calc_calmar_ratio

    out = calc_calmar_ratio(df, "p", "d").collect()[0]
    yf = (3 * 365 * 86400) / 31_557_600
    cagr = (130.0 / 100.0) ** (1 / yf) - 1
    mdd = 90.0 / 120.0 - 1
    aae(out["p_calmar_ratio"], cagr / abs(mdd), places=9)


def test_calc_var_cvar_known_distribution(spark):
    from pyspark.sql import functions as F

    from ffn_polars_spark.functions.eod_risk import calc_var_cvar

    # returns -100..-1 and 1..100 scaled: alpha=0.05 over 200 values
    vals = [float(v) / 100 for v in range(-100, 0)] + [
        float(v) / 100 for v in range(1, 101)
    ]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "ret"])
    r = calc_var_cvar(df, "ret", group_by="grp", alpha=0.05).collect()[0]
    assert r.n == 200
    # VaR: interpolated 5% quantile of the sorted values
    import numpy as np

    want_var = float(np.quantile(np.array(vals), 0.05))
    assert abs(r.var - round(want_var, 6)) < 1e-9
    tail = [v for v in vals if v <= want_var]
    assert r.n_tail == len(tail)
    assert abs(r.cvar - round(sum(tail) / len(tail), 6)) < 1e-6
    # CVaR is at least as bad as VaR
    assert r.cvar <= r.var


def test_omega_ratio_hand_computed(spark):
    import ffn_polars_spark as ffn

    df = spark.createDataFrame(
        [(0.10,), (-0.05,), (0.02,), (-0.01,)], ["r"]
    )
    got = df.agg(ffn.eod.omega_ratio("r")).collect()[0][0]
    assert abs(got - (0.10 + 0.02) / (0.05 + 0.01)) < 1e-12

    # all gains: no loss mass -> NULL
    up = spark.createDataFrame([(0.1,), (0.2,)], ["r"])
    assert up.agg(ffn.eod.omega_ratio("r")).collect()[0][0] is None

    # nonzero threshold moves mass between the two sums
    got_t = df.agg(ffn.eod.omega_ratio("r", threshold=0.02)).collect()[0][0]
    assert abs(got_t - 0.08 / (0.07 + 0.00 + 0.03)) < 1e-12


def test_capture_ratios_hand_computed(spark):
    from ffn_polars_spark.functions.eod_ratios import capture_ratios

    rows = [
        ("A", 0.10, 0.05), ("A", 0.02, 0.04),     # bench up: r avg .06 / b avg .045
        ("A", -0.03, -0.06), ("A", -0.01, -0.02), # bench down: -.02 / -.04
        ("A", 0.99, 0.0),                          # flat bench: neither regime
        ("A", None, 0.5), ("A", 0.5, None),        # NULLs excluded
    ]
    df = spark.createDataFrame(rows, ["k", "r", "rb"])
    out = capture_ratios(df, "r", "rb", by="k").collect()[0]
    assert abs(out.up_capture - 0.06 / 0.045) < 1e-12
    assert abs(out.down_capture - 0.02 / 0.04) < 1e-12
    assert out.n_up == 2 and out.n_down == 2

    # benchmark never falls -> down_capture NULL
    bull = spark.createDataFrame(
        [("A", 0.1, 0.2), ("A", 0.0, 0.1)], ["k", "r", "rb"]
    )
    b = capture_ratios(bull, "r", "rb", by="k").collect()[0]
    assert b.down_capture is None and b.n_down == 0


def test_constant_series_ratios_null_not_ansi_crash(spark):
    """r13 ANSI zero-div audit: constant series make the deviation 0.0 and
    the unguarded mean/std divisions threw DIVIDE_BY_ZERO under ANSI mode.
    Contract: sharpe/risk_return NULL, information ratio 0.0 (its
    documented undefined-case coalesce), burstiness and the price CV NULL
    when their denominators are 0."""
    import ffn_polars_spark as ffn
    from ffn_polars_spark import Over

    df = spark.createDataFrame(
        [(i, 5.0, 5.0) for i in range(6)], ["i", "p", "b"]
    )
    row = df.agg(
        ffn.eod.calc_sharpe("p").alias("sharpe"),
        ffn.eod.calc_risk_return_ratio("p").alias("rrr"),
        ffn.eod.calc_information_ratio("p", "b").alias("ir"),
        ffn.tick.calc_price_volatility_ratio("p").alias("pvr"),
    ).collect()[0]
    assert row["sharpe"] is None
    assert row["rrr"] is None
    assert row["ir"] == 0.0
    # constant positive prices: std 0 over nonzero mean -> CV 0, defined
    assert row["pvr"] == 0.0

    # zero-mean price tape: CV undefined -> NULL
    zm = spark.createDataFrame([(1.0,), (-1.0,)], ["p"])
    assert zm.agg(ffn.tick.calc_price_volatility_ratio("p")).collect()[0][0] is None

    # all events on one timestamp: mean delta 0 -> burstiness NULL
    from ffn_polars_spark.functions.tick_activity import calc_burstiness

    ts = spark.createDataFrame([(100,), (100,), (100,)], ["ts_ns"])
    assert calc_burstiness(ts, "ts_ns").collect()[0][0] is None
