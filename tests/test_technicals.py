"""Technical-indicator operators: MACD, RSI, Bollinger bands."""

import numpy as np
import pandas as pd

from ffn_polars_spark.plans import count_exchanges, explain_str
from ffn_polars_spark.queries import QUERY_FNS
from tests.conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def test_macd_matches_pandas_ewm(spark):
    from ffn_polars_spark.operators.recursive import macd

    rng = np.random.RandomState(3)
    px = 100.0 + np.cumsum(rng.normal(0, 0.5, 200))
    df = spark.createDataFrame(
        [("A", i, float(p)) for i, p in enumerate(px)], ["k", "i", "p"]
    )
    got = (
        macd(df, "p", "i", by=["k"])
        .orderBy("i")
        .select("macd", "macd_signal", "macd_hist")
        .toPandas()
    )
    s = pd.Series(px)
    ef = s.ewm(span=12, adjust=False).mean()
    es = s.ewm(span=26, adjust=False).mean()
    m = ef - es
    sig = m.ewm(span=9, adjust=False).mean()
    assert np.allclose(got["macd"], m, atol=1e-9)
    assert np.allclose(got["macd_signal"], sig, atol=1e-9)
    assert np.allclose(got["macd_hist"], m - sig, atol=1e-9)


def test_rsi_monotone_and_replay(spark):
    from ffn_polars_spark.operators.recursive import rsi

    # strictly rising series: avg_loss stays 0 -> RSI saturates at 100
    up = spark.createDataFrame(
        [("A", i, 100.0 + i) for i in range(30)], ["k", "i", "p"]
    )
    rows = rsi(up, "p", "i", by=["k"]).orderBy("i").collect()
    assert rows[0].p_rsi is None  # no change yet
    assert all(r.p_rsi == 100.0 for r in rows[1:])

    # flat series: both averages zero -> null
    flat = spark.createDataFrame(
        [("A", i, 50.0) for i in range(10)], ["k", "i", "p"]
    )
    assert all(
        r.p_rsi is None for r in rsi(flat, "p", "i", by=["k"]).collect()
    )

    # numpy replay on a mixed series
    rng = np.random.RandomState(7)
    px = 100.0 + np.cumsum(rng.normal(0, 1.0, 120))
    df = spark.createDataFrame(
        [("A", i, float(p)) for i, p in enumerate(px)], ["k", "i", "p"]
    )
    got = rsi(df, "p", "i", by=["k"], n=14).orderBy("i").collect()
    a, b = 1.0 / 14.0, 1.0 - 1.0 / 14.0
    ag = al = None
    for i in range(1, len(px)):
        d = px[i] - px[i - 1]
        g, l = max(d, 0.0), max(-d, 0.0)
        ag = g if i == 1 else a * g + b * ag
        al = l if i == 1 else a * l + b * al
        want = 100.0 - 100.0 / (1.0 + ag / al) if al > 0 else 100.0
        assert abs(got[i].p_rsi - want) < 1e-9


def test_bollinger_matches_pandas_rolling(spark):
    from ffn_polars_spark import Over
    from ffn_polars_spark.functions.rolling import bollinger

    rng = np.random.RandomState(9)
    px = 100.0 + np.cumsum(rng.normal(0, 0.3, 80))
    df = spark.createDataFrame(
        [("A", i, float(p)) for i, p in enumerate(px)], ["k", "i", "p"]
    )
    out = (
        bollinger(df, "p", over=Over(order_by="i", partition_by="k"),
                  window=20, k=2.0)
        .orderBy("i")
        .toPandas()
    )
    s = pd.Series(px)
    mid = s.rolling(20).mean()
    sd = s.rolling(20).std()
    assert out["bb_mid"][:19].isna().all()
    assert np.allclose(out["bb_mid"][19:], mid[19:], atol=1e-9)
    assert np.allclose(out["bb_up"][19:], (mid + 2 * sd)[19:], atol=1e-9)
    assert np.allclose(out["bb_dn"][19:], (mid - 2 * sd)[19:], atol=1e-9)
    pctb = (s - (mid - 2 * sd)) / ((mid + 2 * sd) - (mid - 2 * sd))
    assert np.allclose(out["bb_pctb"][19:], pctb[19:], atol=1e-9)


def test_bollinger_plan_single_window_no_join(spark):
    df = QUERY_FNS["bollinger"](spark, SF)
    plan = explain_str(df)
    assert "Join" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert count_exchanges(df) <= 2
