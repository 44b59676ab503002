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


def test_corr_matrix_perfect_and_upper_triangle(spark):
    from pyspark.sql import functions as F

    from ffn_polars_spark.operators.wide import corr_matrix

    # one tick per (key, minute-bucket); Y = 2*X (identical returns, corr
    # +1); W doubles every bucket (constant +100% returns: zero variance)
    rows = []
    for i, (x, w) in enumerate(zip([1.0, 2.0, 3.0, 5.0], [1.0, 2.0, 4.0, 8.0])):
        t = i * 60_000_000_000
        rows += [("W", t, w), ("X", t, x), ("Y", t, 2 * x)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ns", "price"])
    out = {
        (r.key_a, r.key_b): r
        for r in corr_matrix(df, min_buckets=2).collect()
    }
    # upper triangle only
    assert set(out) == {("W", "X"), ("W", "Y"), ("X", "Y")}
    assert out[("X", "Y")].n_buckets == 3
    # X returns [1.0, 0.5, 0.667] vary; Y's are identical -> corr exactly 1
    assert out[("X", "Y")].ret_corr == 1.0
    # W's returns are constant -> zero variance -> corr undefined/NULL
    # (this is the ANSI divide-by-zero path the guarded moments avoid)
    assert out[("W", "X")].ret_corr is None


def test_corr_matrix_min_buckets_filter(spark):
    from ffn_polars_spark.operators.wide import corr_matrix

    # only 2 buckets -> 1 joint return per pair -> filtered by min_buckets=2
    rows = [
        ("A", 0, 1.0), ("A", 60_000_000_000, 2.0),
        ("B", 0, 2.0), ("B", 60_000_000_000, 1.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts_ns", "price"])
    assert corr_matrix(df, min_buckets=2).count() == 0
    assert corr_matrix(df, min_buckets=1).count() == 1


def test_pivot_prices_agg_modes(spark):
    from ffn_polars_spark.operators.wide import pivot_prices

    df = spark.createDataFrame(
        [(1, "A", 10.0), (1, "A", 20.0), (1, "B", 5.0), (2, "A", 7.0)],
        ["d", "ticker", "price"],
    )
    avg = {r.d: r for r in pivot_prices(df, "d", keys=["A", "B"], agg="avg").collect()}
    assert avg[1].A == 15.0 and avg[1].B == 5.0
    assert avg[2].A == 7.0 and avg[2].B is None
    mx = {r.d: r for r in pivot_prices(df, "d", keys=["A", "B"], agg="max").collect()}
    assert mx[1].A == 20.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pivot_prices(df, "d", agg="median")


def test_topk_churn_set_overlap(spark):
    from ffn_polars_spark.operators.wide import topk_churn
    rows = (
        [(1, "a")] * 3 + [(1, "b")] * 2 + [(1, "c")] * 1   # day1 top2 {a,b}
        + [(2, "c")] * 5 + [(2, "d")] * 4 + [(2, "a")] * 1 # day2 top2 {c,d}
        + [(3, "c")] * 2 + [(3, "d")] * 2                  # day3 top2 {c,d}
    )
    out = topk_churn(
        spark.createDataFrame(rows, ["p", "k"]), "p", "k", k=2
    ).collect()
    got = {r["period"]: r for r in out}
    assert sorted(got) == [2, 3]  # day1 has no predecessor
    assert got[2]["n_common"] == 0 and got[2]["jaccard"] == 0.0
    assert got[3]["n_common"] == 2 and got[3]["jaccard"] == 1.0
