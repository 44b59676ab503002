"""Golden-value tests against the reference's 10-year price CSV.

Pinned constants come from the reference's own test suite
(tests/expr/test_expr_core.py) — they are the cross-engine oracle: our Spark
engine must reproduce them from the same CSV, including output column names.
"""

import math

import pytest
from pyspark.sql import functions as F

import ffn_polars_spark as ffn
from ffn_polars_spark import Over

from conftest import aae

OVER = Over(order_by="Date")


def test_to_returns_golden(spark, golden):
    out = golden.select("Date", ffn.eod.to_returns("AAPL", over=OVER)).orderBy("Date")
    assert out.columns == ["Date", "AAPL_returns"]
    rows = out.limit(3).collect()
    assert rows[0]["AAPL_returns"] is None
    # reference tests/expr/test_expr_core.py:14-22
    aae(rows[1]["AAPL_returns"], -0.019148, places=5)
    aae(rows[2]["AAPL_returns"], 0.015101, places=5)


def test_to_log_returns_golden(spark, golden):
    out = golden.select(ffn.eod.to_log_returns("AAPL", over=OVER)).orderBy(F.lit(1))
    assert out.columns == ["AAPL_log_returns"]
    rows = golden.select("Date", ffn.eod.to_log_returns("AAPL", over=OVER)).orderBy("Date").limit(2).collect()
    assert rows[0]["AAPL_log_returns"] is None
    aae(rows[1]["AAPL_log_returns"], math.log(13.575 / 13.84), places=9)


def test_price_index_and_rebase(spark, golden):
    rets = golden.select(
        "Date", ffn.eod.to_returns("AAPL", over=OVER).alias("AAPL_returns")
    )
    out = rets.select(
        "Date", ffn.eod.to_price_index("AAPL_returns", start=100, over=OVER)
    ).orderBy("Date")
    assert out.columns == ["Date", "AAPL_price_index"]
    rows = out.limit(2).collect()
    aae(rows[0]["AAPL_price_index"], 100.0, places=9)  # null return -> factor 1
    aae(rows[1]["AAPL_price_index"], 100.0 * (13.575 / 13.84), places=6)

    reb = golden.select("Date", ffn.eod.rebase("AAPL", value=100, over=OVER)).orderBy("Date")
    assert reb.columns == ["Date", "AAPL_rebased"]
    r = reb.limit(2).collect()
    aae(r[0]["AAPL_rebased"], 100.0, places=9)
    aae(r[1]["AAPL_rebased"], 100.0 * 13.575 / 13.84, places=6)


def test_cagr_golden(spark, golden):
    # reference tests/expr/test_expr_core.py:120-129: 0.440 / 0.041 / -0.205
    row = golden.select(
        ffn.eod.calc_cagr("AAPL", "Date"),
        ffn.eod.calc_cagr("MSFT", "Date"),
        ffn.eod.calc_cagr("C", "Date"),
    ).collect()[0]
    aae(row["AAPL_cagr"], 0.440, places=3)
    aae(row["MSFT_cagr"], 0.041, places=3)
    aae(row["C_cagr"], -0.205, places=3)


def test_year_frac_golden(spark, golden):
    # reference tests/expr/test_expr_core.py:114-117
    row = golden.select(ffn.eod.year_frac("Date")).collect()[0]
    aae(row["Date_year_frac"], 9.9986, places=4)


def test_max_drawdown_first10(spark, golden):
    # reference tests/expr/test_expr_core.py:100-111: maxDD over first 10 rows
    first10 = golden.orderBy("Date").limit(10)
    out = ffn.eod.calc_max_drawdown(first10, "AAPL", order_by="Date")
    row = out.collect()[0]
    aae(row["AAPL_max_drawdown"], -0.086, places=3)


def test_total_return(spark, golden):
    row = golden.select(ffn.eod.calc_total_return("AAPL", "Date")).collect()[0]
    first, last = 13.84, None
    ordered = golden.orderBy("Date").select("AAPL").collect()
    last = ordered[-1]["AAPL"]
    aae(row["AAPL_total_return"], last / first - 1, places=6)


def test_excess_returns_contracts(spark, golden):
    with pytest.raises(TypeError):
        ffn.eod.to_excess_returns("AAPL", rf=[1, 2], n=252)
    # float rf deannualized
    df = spark.createDataFrame([(0.01,), (0.02,)], ["r"])
    out = df.select(ffn.eod.to_excess_returns("r", rf=0.05, n=252)).collect()
    expected = 0.01 - ((1.05) ** (1 / 252) - 1)
    aae(out[0]["r_excess"], expected, places=9)


def test_series_ops_require_order():
    with pytest.raises(ValueError, match="order-dependent"):
        ffn.eod.to_returns("AAPL", over=Over())


def test_grouped_series_ops(spark):
    data = [("A", 1, 10.0), ("A", 2, 11.0), ("B", 1, 5.0), ("B", 2, 4.0)]
    df = spark.createDataFrame(data, ["ticker", "t", "price"])
    over = Over(order_by="t", partition_by="ticker")
    out = (
        df.select("ticker", "t", ffn.eod.to_returns("price", over=over))
        .orderBy("ticker", "t")
        .collect()
    )
    assert out[0]["price_returns"] is None
    aae(out[1]["price_returns"], 0.1, places=9)
    assert out[2]["price_returns"] is None
    aae(out[3]["price_returns"], -0.2, places=9)


def test_calc_mtd_reference_pinned(spark):
    # reference tests/expr/test_expr_core.py:71-84: daily 2024-03-01..04-10,
    # prices 100..140 -> latest 140 vs last-of-March 130
    import datetime

    rows = [
        (datetime.date(2024, 3, 1) + datetime.timedelta(days=i), 100.0 + i)
        for i in range(41)
    ]
    df = spark.createDataFrame(rows, ["Date", "AAPL"])
    from ffn_polars_spark.functions.eod_returns import calc_mtd

    out = calc_mtd(df, "AAPL", "Date").collect()[0]["AAPL_mtd"]
    aae(out, 140 / 130 - 1, places=4)


def test_calc_ytd_reference_pinned(spark):
    # reference tests/expr/test_expr_core.py:86-99: daily 2024-01-01..04-09,
    # prices 100..199 -> 199/100 - 1
    import datetime

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), 100.0 + i)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["Date", "AAPL"])
    out = df.select(ffn.eod.calc_ytd("AAPL", "Date")).collect()[0]["AAPL_ytd"]
    aae(out, 0.99, places=4)


def test_portfolio_returns_weighted_mean_and_renormalization(spark):
    from ffn_polars_spark.functions.eod_returns import portfolio_returns

    rows = [
        (1, "A", 0.10), (1, "B", -0.02), (1, "C", 0.04),
        (2, "A", 0.05), (2, "B", 0.01),          # C missing at t=2
        (3, "A", None), (3, "B", 0.02), (3, "C", 0.02),
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "r"])
    w = {"A": 0.5, "B": 0.3, "C": 0.2}
    out = {
        r.ts: r
        for r in portfolio_returns(df, w, "k", "ts", "r").collect()
    }
    # full period: plain weighted sum
    assert abs(out[1].portfolio_return - (0.5*0.10 + 0.3*-0.02 + 0.2*0.04)) < 1e-12
    assert out[1].n_assets == 3
    # C missing: renormalize over A+B
    assert abs(out[2].portfolio_return - (0.5*0.05 + 0.3*0.01) / 0.8) < 1e-12
    assert out[2].n_assets == 2
    # NULL return rows are excluded like missing assets
    assert abs(out[3].portfolio_return - (0.3*0.02 + 0.2*0.02) / 0.5) < 1e-12
    # unknown assets (no weight) are ignored entirely
    extra = spark.createDataFrame(rows + [(1, "Z", 9.9)], ["ts", "k", "r"])
    out2 = portfolio_returns(extra, w, "k", "ts", "r").collect()
    assert {r.ts: r.portfolio_return for r in out2}[1] == out[1].portfolio_return


def test_return_stats_moments_match_numpy(spark):
    import numpy as np

    from ffn_polars_spark.functions.eod_risk import return_stats

    rng = np.random.RandomState(3)
    vals = rng.normal(0.001, 0.02, 500).tolist() + [None]
    df = spark.createDataFrame([(v,) for v in vals], ["r"])
    out = return_stats(df, "r").collect()[0]
    a = np.array([v for v in vals if v is not None])
    m = a - a.mean()
    assert out.n == 500
    assert abs(out.mean - a.mean()) < 1e-12
    assert abs(out.vol - a.std(ddof=1)) < 1e-12
    assert abs(out.skew - (m**3).mean() / (m**2).mean() ** 1.5) < 1e-9
    assert abs(out.kurt_excess - ((m**4).mean() / (m**2).mean() ** 2 - 3)) < 1e-9
    assert out.best == a.max() and out.worst == a.min()
    assert abs(out.win_rate - (a > 0).mean()) < 1e-12

    # constant series: vol 0, skew/kurt NULL (not a divide error)
    c = spark.createDataFrame([(0.01,)] * 5, ["r"])
    cc = return_stats(c, "r").collect()[0]
    assert cc.skew is None and cc.kurt_excess is None


def test_streak_stats_hand_computed(spark):
    from ffn_polars_spark.functions.eod_risk import streak_stats

    # signs: + + + - - + 0 - : max win 3, max loss 2, runs: +3,-2,+1,0,- -> 5
    rs = [0.1, 0.2, 0.1, -0.1, -0.2, 0.3, 0.0, -0.5]
    df = spark.createDataFrame(
        [("A", i, r) for i, r in enumerate(rs)], ["k", "i", "r"]
    )
    out = streak_stats(df, "r", order_by="i", by="k").collect()[0]
    assert out.max_win_streak == 3
    assert out.max_loss_streak == 2
    assert out.n_runs == 5

    # all wins: loss streak NULL
    up = spark.createDataFrame(
        [("A", i, 0.1) for i in range(4)], ["k", "i", "r"]
    )
    u = streak_stats(up, "r", order_by="i", by="k").collect()[0]
    assert u.max_win_streak == 4 and u.max_loss_streak is None


def test_variance_ratio_iid_and_trending(spark):
    import numpy as np

    from ffn_polars_spark.functions.eod_risk import variance_ratio

    # numpy replay on a small series with overlapping q-sums
    rng = np.random.RandomState(5)
    rs = rng.normal(0, 0.01, 300)
    df = spark.createDataFrame(
        [("A", i, float(r)) for i, r in enumerate(rs)], ["k", "i", "r"]
    )
    out = {
        r.q: r
        for r in variance_ratio(df, "r", order_by="i", by="k").collect()
    }
    for q in (2, 4, 8):
        rq = np.array([rs[i - q + 1: i + 1].sum() for i in range(q - 1, 300)])
        want = rq.var(ddof=1) / (q * rs.var(ddof=1))
        assert abs(out[q].vr - want) < 1e-9, q
        assert out[q].n_obs == 300 - q + 1
    # iid noise: VR near 1
    assert 0.7 < out[2].vr < 1.3

    # a pure trend (constant positive return) has zero variance at every
    # horizon -> v1 = 0 -> NULL (guarded, not a divide error)
    tr = spark.createDataFrame(
        [("A", i, 0.01) for i in range(50)], ["k", "i", "r"]
    )
    assert all(
        r.vr is None
        for r in variance_ratio(tr, "r", order_by="i", by="k").collect()
    )


def test_hurst_exponent_numpy_replay_and_iid(spark):
    import numpy as np

    from ffn_polars_spark.functions.eod_risk import hurst_exponent

    rng = np.random.RandomState(11)
    rs = rng.normal(0, 0.01, 500)
    df = spark.createDataFrame(
        [("A", i, float(r)) for i, r in enumerate(rs)], ["k", "i", "r"]
    )
    row = hurst_exponent(df, "r", order_by="i", by="k").collect()[0]
    # numpy replay: var of overlapping q-sums, OLS slope of ln var on ln q
    xs, ys = [], []
    for q in (1, 2, 4, 8, 16):
        rq = np.array([rs[i - q + 1: i + 1].sum() for i in range(q - 1, 500)])
        xs.append(np.log(q)), ys.append(np.log(rq.var(ddof=1)))
    xs, ys = np.array(xs), np.array(ys)
    want = ((xs - xs.mean()) * (ys - ys.mean())).sum() / (
        (xs - xs.mean()) ** 2
    ).sum() / 2
    assert abs(row.hurst - want) < 1e-9
    assert row.n_qs == 5 and row.n_obs == 500
    # iid noise is a random walk in levels: H near 0.5
    assert 0.35 < row.hurst < 0.65
    # constant series: every horizon variance is 0 -> no points -> NULL
    tr = spark.createDataFrame(
        [("A", i, 0.01) for i in range(50)], ["k", "i", "r"]
    )
    t = hurst_exponent(tr, "r", order_by="i", by="k").collect()
    assert t == [] or all(r.hurst is None for r in t)


def test_portfolio_turnover_hand_computed(spark):
    from ffn_polars_spark.functions.eod_returns import portfolio_turnover

    rows = [
        (1, "A", 0.10), (1, "B", -0.10),
        (2, "A", 0.00), (2, "B", 0.00),   # no drift -> zero turnover
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "r"])
    out = {
        r.ts: r
        for r in portfolio_turnover(
            df, {"A": 0.6, "B": 0.4}, "k", "ts", "r", cost_bps=10.0
        ).collect()
    }
    pr = 0.6 * 0.10 + 0.4 * (-0.10)
    grow = 0.6 * 1.1 + 0.4 * 0.9
    tn = 0.5 * (abs(0.6 - 0.6 * 1.1 / grow) + abs(0.4 - 0.4 * 0.9 / grow))
    assert abs(out[1].portfolio_return - pr) < 1e-12
    assert abs(out[1].turnover - tn) < 1e-12
    assert abs(out[1].net_return - (pr - 0.001 * tn)) < 1e-12
    assert abs(out[2].turnover) < 1e-15 and abs(out[2].net_return) < 1e-15
    assert out[1].n_assets == 2


def test_drawdown_at_risk_hand_computed(spark):
    from ffn_polars_spark.functions.eod_risk import drawdown_at_risk

    # price path with 3 episodes of depths -50%, -10%, -20%
    prices = [100, 50, 110, 99, 120, 96, 130]
    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(prices)], ["d", "price"]
    )
    row = drawdown_at_risk(df, "price", order_by="d", alpha=0.9).collect()[0]
    assert row.n_episodes == 3
    assert abs(row.worst - -0.5) < 1e-9
    # depths sorted: [-0.5, -0.2, -0.1]; 0.1-quantile interpolates in the
    # worst gap: -0.5 + 0.2*(-0.2 - -0.5) = -0.44
    assert abs(row.dar - -0.44) < 1e-9
    assert row.n_tail == 1 and abs(row.ced - -0.5) < 1e-9


def test_weekday_returns_buckets_and_stats(spark):
    import datetime

    from ffn_polars_spark.functions.eod_temporal import weekday_returns

    # 1970-01-05 was a Monday (dow=1 in the (epoch+4)%7 convention)
    base = datetime.date(1970, 1, 5)
    rows = []
    # two Mondays up 1%, two Tuesdays down 2%
    for wk in range(2):
        rows.append((base + datetime.timedelta(days=7 * wk), 0.01))
        rows.append((base + datetime.timedelta(days=7 * wk + 1), -0.02))
    df = spark.createDataFrame(rows, ["d", "r"])
    out = {r.dow: r for r in weekday_returns(df, "r", "d").collect()}
    assert set(out) == {1, 2}
    assert out[1].n == 2 and abs(out[1].mean_r - 0.01) < 1e-12
    assert out[1].win_rate == 1.0 and out[2].win_rate == 0.0
    # zero variance within each weekday -> t_stat null
    assert out[1].t_stat is None
