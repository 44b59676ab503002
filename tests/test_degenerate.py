"""Degenerate-input contracts: zero denominators degrade to NULL, never
throw.

Under Spark 4's default ANSI mode, dividing by an exactly-0.0
data-derived denominator raises DIVIDE_BY_ZERO — so every shape a 100 TB
corpus is full of (constant prices, zero first prices, zero-norm
embeddings, one-class label columns, all-zero value columns) must be
NULL-guarded at the operator layer. tools/degenerate_sweep.py runs the
whole 302-query catalog against two such corpora; these tests pin the
per-operator contracts the sweep found violated, so a regression fails
in seconds instead of at sweep time.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.core import Over, safe_div


def test_safe_div_nulls_on_zero(spark):
    df = spark.range(1).select(
        safe_div(F.lit(1.0), F.lit(0.0)).alias("z"),
        safe_div(F.lit(1.0), F.lit(2.0)).alias("half"),
        safe_div(F.lit(0.0), F.lit(0.0)).alias("zz"),
    )
    row = df.collect()[0]
    assert row["z"] is None and row["zz"] is None
    assert row["half"] == 0.5


@pytest.fixture(scope="module")
def zero_first_prices(spark):
    """A series whose FIRST price is 0.0 (then positive) and a series that
    is constant-zero throughout — the shapes that zeroed first/cummax
    denominators across the returns/drawdown family."""
    d0 = dt.date(2023, 1, 2)
    rows = [
        ("zf", d0 + dt.timedelta(days=i), p)
        for i, p in enumerate([0.0, 100.0, 110.0, 90.0])
    ] + [("cz", d0 + dt.timedelta(days=i), 0.0) for i in range(4)]
    return spark.createDataFrame(rows, "key string, d date, price double")


def test_returns_family_zero_first_price(spark, zero_first_prices):
    from ffn_polars_spark.functions.eod_returns import (
        calc_cagr,
        calc_total_return,
        calc_ytd,
        to_log_returns,
        to_returns,
    )

    over = Over(order_by="d", partition_by=["key"])
    out = (
        zero_first_prices.select(
            "key",
            to_returns("price", over=over).alias("r"),
            to_log_returns("price", over=over).alias("lr"),
        )
        .where(F.col("key") == "zf")
        .orderBy("r")
        .collect()
    )
    # 100/0 - 1 must be NULL, not a DIVIDE_BY_ZERO throw
    assert any(r["r"] is None for r in out)

    agg = (
        zero_first_prices.groupBy("key")
        .agg(
            calc_total_return("price", "d").alias("tr"),
            calc_cagr(F.col("price"), F.col("d")).alias("cagr"),
            calc_ytd("price", "d").alias("ytd"),
        )
        .collect()
    )
    by_key = {r["key"]: r for r in agg}
    assert by_key["zf"]["tr"] is None  # first price 0 -> undefined
    assert by_key["zf"]["cagr"] is None
    assert by_key["zf"]["ytd"] is None


def test_cagr_single_date_null(spark):
    # span of 0 seconds -> year_frac 0 -> exponent undefined -> NULL
    df = spark.createDataFrame(
        [("k", dt.date(2023, 1, 2), 100.0), ("k", dt.date(2023, 1, 2), 110.0)],
        "key string, d date, price double",
    )
    from ffn_polars_spark.functions.eod_returns import calc_cagr

    row = df.groupBy("key").agg(calc_cagr(F.col("price"), F.col("d")).alias("c")).collect()[0]
    assert row["c"] is None


def test_drawdown_family_zero_prices(spark, zero_first_prices):
    from ffn_polars_spark.functions.eod_risk import (
        calc_max_drawdown,
        ulcer_index,
        ulcer_performance_index,
    )

    cz = zero_first_prices.where(F.col("key") == "cz")
    mdd = calc_max_drawdown(cz, "price", order_by="d", by=["key"]).collect()[0]
    assert mdd["price_max_drawdown"] is None  # cummax 0 -> undefined dd

    ui = ulcer_index(cz, "price", order_by="d", by=["key"]).collect()[0]
    assert ui["price_ulcer_index"] is None

    # constant positive prices: ulcer index is exactly 0 -> UPI undefined
    const = spark.createDataFrame(
        [("k", dt.date(2023, 1, 2 + i), 100.0) for i in range(4)],
        "key string, d date, price double",
    )
    upi = ulcer_performance_index(const, "price", order_by="d", by=["key"]).collect()[0]
    assert upi["price_ulcer_performance_index"] is None


def test_calmar_zero_drawdown_null(spark):
    # monotone rising prices: |max drawdown| = 0 -> Calmar undefined
    df = spark.createDataFrame(
        [("k", dt.date(2023, 1, 2 + i), 100.0 + i) for i in range(4)],
        "key string, d date, price double",
    )
    from ffn_polars_spark.functions.eod_ratios import calc_calmar_ratio

    row = calc_calmar_ratio(df, "price", "d", by=["key"]).collect()[0]
    assert row["price_calmar_ratio"] is None


def test_cosine_zero_vector_null(spark):
    from ffn_polars_spark.operators.similarity import cosine, unit

    df = spark.createDataFrame(
        [([0.0, 0.0],), ([3.0, 4.0],)], "v array<double>"
    ).select(
        cosine(F.col("v"), F.col("v")).alias("c"),
        unit(F.col("v")).alias("u"),
    )
    rows = sorted(df.collect(), key=lambda r: (r["c"] is None, r["c"] or 0))
    # zero vector: cosine NULL, unit elements NULL
    zero = [r for r in rows if r["c"] is None][0]
    assert all(x is None for x in zero["u"])
    # nonzero vector: cosine(v, v) = 1, unit = v / |v|
    good = [r for r in rows if r["c"] is not None][0]
    assert good["c"] == pytest.approx(1.0)
    assert good["u"] == pytest.approx([0.6, 0.8])


def test_information_value_one_class(spark):
    # labels all-negative: total positives 0 -> shares clamp to eps, no throw
    from ffn_polars_spark.operators.evaluation import information_value

    df = spark.createDataFrame(
        [(float(i) / 10, 0) for i in range(20)], "score double, label int"
    )
    out = information_value(df, "score", "label", bins=4).collect()
    assert len(out) > 0  # degraded, not crashed


def test_lsh_kernels_null_vectors(spark):
    """NULL vectors and NULL array elements reach the Arrow bucket/cell
    kernels as None/NaN rows; they must bucket to NULL (dropping out of
    the candidate joins), not crash the stage with a ragged np.stack."""
    from ffn_polars_spark.operators._arrow_kernels import (
        make_bucket_udf,
        make_cell_assign_udf,
    )

    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [0.5, None]), (4, [0.0, 1.0])],
        "vec_id long, v array<double>",
    )
    b = make_bucket_udf([[[1.0, 0.0]], [[0.0, 1.0]]])
    c = make_cell_assign_udf([[1.0, 0.0], [0.0, 1.0]], nprobe=1)
    rows = {r["vec_id"]: r for r in df.select("vec_id", b("v").alias("b"), c("v").alias("c")).collect()}
    assert rows[1]["b"] is None and rows[1]["c"] is None  # NULL vector
    assert rows[3]["b"] is None and rows[3]["c"] is None  # NULL element
    assert rows[2]["b"] is not None and rows[4]["c"] is not None


def test_lsh_dedup_all_null_vectors(spark):
    from ffn_polars_spark.operators.similarity import dedup_embedding_lsh

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    out = dedup_embedding_lsh(df)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "cosine"}


def test_gram_frame_skips_null_elements(spark):
    from ffn_polars_spark.operators.linalg import gram_frame

    df = spark.createDataFrame(
        [(1, [1.0, None]), (2, [2.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    rows = {(r["__i"], r["__j"]): r["__s"] for r in gram_frame(df, "embedding").collect()}
    # only row 2 contributes: S = [[4, 0], [0, 0]]
    assert rows[(0, 0)] == 4.0 and rows[(1, 1)] == 0.0


def test_abc_analysis_zero_total(spark):
    from ffn_polars_spark.operators.quality import abc_analysis

    df = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0)], "k string, v double"
    )
    out = abc_analysis(df, "k", "v").collect()
    assert {r["abc_class"] for r in out} == {"C"}
    assert all(r["share"] is None for r in out)
