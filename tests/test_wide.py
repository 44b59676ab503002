"""Wide-table helpers: multi-column apply, melt/pivot round-trip, golden-CSV
integration (the reference's own wide workflow)."""

import pytest

import ffn_polars_spark as ffn
from ffn_polars_spark import Over
from ffn_polars_spark.operators.wide import apply_to_columns, melt, pivot_prices


@pytest.fixture(scope="module")
def wide(spark):
    rows = [
        ("2020-01-01", 10.0, 100.0),
        ("2020-01-02", 11.0, 90.0),
        ("2020-01-03", 12.1, 81.0),
    ]
    return spark.createDataFrame(rows, ["Date", "AAA", "BBB"]).cache()


def test_apply_to_columns(wide):
    out = apply_to_columns(
        wide,
        ffn.eod.to_returns,
        ["AAA", "BBB"],
        keep=["Date"],
        over=Over(order_by="Date"),
    )
    assert out.columns == ["Date", "AAA_returns", "BBB_returns"]
    rows = out.orderBy("Date").collect()
    assert rows[0]["AAA_returns"] is None
    assert rows[1]["AAA_returns"] == pytest.approx(0.1)
    assert rows[1]["BBB_returns"] == pytest.approx(-0.1)


def test_melt_pivot_roundtrip(wide):
    long = melt(wide, ["Date"], ["AAA", "BBB"])
    assert long.columns == ["Date", "ticker", "price"]
    assert long.count() == 6
    # grouped operator on the melted layout
    r = (
        long.groupBy("ticker")
        .agg(ffn.tick.calc_price_volatility_ratio("price"))
        .collect()
    )
    assert len(r) == 2
    back = pivot_prices(long, "Date", keys=["AAA", "BBB"])
    orig = {r["Date"]: (r["AAA"], r["BBB"]) for r in wide.collect()}
    got = {r["Date"]: (r["AAA"], r["BBB"]) for r in back.collect()}
    assert got == orig


def test_wide_workflow_on_golden(spark, golden):
    # the reference's per-ticker CAGR run, all three tickers in one pass
    out = apply_to_columns(
        golden, ffn.eod.calc_cagr, ["AAPL", "MSFT", "C"], date_col="Date"
    ).collect()[0]
    from conftest import aae

    aae(out["AAPL_cagr"], 0.440, places=3)
    aae(out["MSFT_cagr"], 0.041, places=3)
    aae(out["C_cagr"], -0.205, places=3)
