"""Rolling-window operators: hand-recomputed expectations, Polars
min_periods=window null semantics, grouped restart."""

import statistics

import pytest
from pyspark.sql import functions as F

import ffn_polars_spark as ffn
from ffn_polars_spark import Over

VALS = [1.0, 4.0, 2.0, 8.0, 5.0, 7.0]
OVER = Over(order_by="i")


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(VALS)], ["i", "x"]
    ).cache()


def collect(df, col):
    return [r[col] for r in df.orderBy("i").collect()]


def test_rolling_mean(frame):
    out = collect(
        frame.select("i", ffn.eod.rolling_mean("x", 3, over=OVER)), "x_rolling_mean"
    )
    assert out[0] is None and out[1] is None
    for k in range(2, 6):
        assert out[k] == pytest.approx(sum(VALS[k - 2 : k + 1]) / 3)


def test_rolling_std_and_zscore(frame):
    std = collect(
        frame.select("i", ffn.eod.rolling_std("x", 3, over=OVER)), "x_rolling_std"
    )
    z = collect(
        frame.select("i", ffn.eod.rolling_zscore("x", 3, over=OVER)), "x_rolling_zscore"
    )
    for k in range(2, 6):
        wnd = VALS[k - 2 : k + 1]
        s = statistics.stdev(wnd)
        assert std[k] == pytest.approx(s)
        assert z[k] == pytest.approx((VALS[k] - sum(wnd) / 3) / s)


def test_rolling_min_max_sum(frame):
    mn = collect(frame.select("i", ffn.eod.rolling_min("x", 2, over=OVER)), "x_rolling_min")
    mx = collect(frame.select("i", ffn.eod.rolling_max("x", 2, over=OVER)), "x_rolling_max")
    sm = collect(frame.select("i", ffn.eod.rolling_sum("x", 2, over=OVER)), "x_rolling_sum")
    assert mn[1:] == [min(VALS[k - 1 : k + 1]) for k in range(1, 6)]
    assert mx[1:] == [max(VALS[k - 1 : k + 1]) for k in range(1, 6)]
    assert sm[1:] == [sum(VALS[k - 1 : k + 1]) for k in range(1, 6)]
    assert mn[0] is None


def test_rolling_corr(spark):
    ys = [2.1, 7.9, 4.2, 15.8, 10.0, 14.1]  # roughly 2x
    df = spark.createDataFrame(
        [(i, VALS[i], ys[i]) for i in range(6)], ["i", "x", "y"]
    )
    out = [
        r["x_rolling_corr"]
        for r in df.select(
            "i", ffn.eod.rolling_corr("x", "y", 3, over=OVER)
        ).orderBy("i").collect()
    ]
    assert out[0] is None and out[1] is None
    import math

    for k in range(2, 6):
        xs, yw = VALS[k - 2 : k + 1], ys[k - 2 : k + 1]
        mx, my = sum(xs) / 3, sum(yw) / 3
        num = sum((a - mx) * (b - my) for a, b in zip(xs, yw))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in yw)
        )
        assert out[k] == pytest.approx(num / den)


def test_rolling_grouped_restart(spark):
    rows = [("a", i, float(i)) for i in range(4)] + [("b", i, 10.0 * i) for i in range(4)]
    df = spark.createDataFrame(rows, ["g", "i", "x"])
    over = Over(order_by="i", partition_by="g")
    out = {
        (r["g"], r["i"]): r["x_rolling_mean"]
        for r in df.select("g", "i", ffn.eod.rolling_mean("x", 2, over=over)).collect()
    }
    assert out[("a", 0)] is None and out[("b", 0)] is None
    assert out[("a", 1)] == 0.5 and out[("b", 1)] == 5.0


def test_rolling_requires_order():
    with pytest.raises(ValueError, match="order"):
        ffn.eod.rolling_mean("x", 3, over=Over())


def test_rolling_beta_recovers_known_slope_and_guards_zero_var(spark):
    from pyspark.sql import functions as F

    import ffn_polars_spark as ffn
    from ffn_polars_spark import Over

    # y = 3x + 7 exactly -> beta = 3 once the window is full; z is constant
    rows = [(i, float(i % 11), 3.0 * (i % 11) + 7.0, 5.0) for i in range(30)]
    df = spark.createDataFrame(rows, ["i", "x", "y", "z"])
    over = Over(order_by="i")
    out = df.select(
        "i",
        ffn.eod.rolling_beta("y", "x", 10, over=over).alias("b"),
        ffn.eod.rolling_beta("y", "z", 10, over=over).alias("bz"),
    ).collect()
    by_i = {r.i: r for r in out}
    assert by_i[5].b is None                     # window not full yet
    for i in range(9, 30):
        assert abs(by_i[i].b - 3.0) < 1e-9       # exact linear relation
        assert by_i[i].bz is None                # zero-variance regressor


def test_rolling_median_ignores_outlier(spark):
    import ffn_polars_spark as ffn
    from ffn_polars_spark import Over

    # constant 10s with one 1000 spike: the 5-row median never moves
    rows = [(i, 1000.0 if i == 10 else 10.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["i", "x"])
    out = {
        r.i: r.m
        for r in df.select(
            "i", ffn.eod.rolling_median("x", 5, over=Over(order_by="i")).alias("m")
        ).collect()
    }
    assert out[3] is None              # window not yet full
    assert all(out[i] == 10.0 for i in range(4, 20))  # spike never wins


def test_rolling_corr_and_zscore_constant_window_null(spark):
    """r13 corr-audit: a constant (zero-variance) window must yield NULL,
    not an ANSI DIVIDE_BY_ZERO crash — F.corr's and the bare zscore
    division's internal guards both throw under ANSI mode."""
    import ffn_polars_spark as ffn
    from ffn_polars_spark import Over

    over = Over(order_by="i")
    df = spark.createDataFrame(
        [(i, 1.0, float(i)) for i in range(6)], ["i", "a", "b"]
    )
    rows = df.select(
        "i",
        ffn.eod.rolling_corr("a", "b", 3, over=over).alias("c"),
        ffn.eod.rolling_zscore("a", 3, over=over).alias("z"),
    ).collect()
    full = [r for r in rows if r["i"] >= 2]
    assert full and all(r["c"] is None for r in full)
    assert all(r["z"] is None for r in full)
    # non-degenerate windows still produce real values
    got = df.select(
        ffn.eod.rolling_corr("b", "b", 3, over=over).alias("c")
    ).collect()
    assert any(r["c"] is not None and abs(r["c"] - 1.0) < 1e-9 for r in got)
