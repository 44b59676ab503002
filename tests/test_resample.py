"""Bootstrap resampling: result shapes (reference tests/df/test_df_core.py)
and statistical sanity of the Poisson single-pass variant."""

import statistics

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.operators.resample import (
    bootstrap_replicate,
    resample_returns,
    resample_returns_poisson,
)

RETURNS = [0.01, 0.02, -0.01, 0.005, 0.015, -0.002, 0.03, 0.007]


@pytest.fixture(scope="module")
def rdf(spark):
    return spark.createDataFrame([(r,) for r in RETURNS], ["r"])


def test_shape_scalar_func(spark, rdf):
    out = resample_returns(rdf, lambda s: s.agg(F.avg("r")).collect()[0][0], num_trials=5)
    rows = out.orderBy("trial").collect()
    assert out.columns == ["trial", "stat"]
    assert [r["trial"] for r in rows] == [0, 1, 2, 3, 4]


def test_shape_dataframe_func(spark, rdf):
    out = resample_returns(
        rdf,
        lambda s: s.agg(F.avg("r").alias("mean_r"), F.stddev_samp("r").alias("std_r")),
        num_trials=3,
    )
    assert sorted(out.columns) == ["mean_r", "std_r", "trial"]
    assert out.count() == 3


def test_bad_func_type(spark, rdf):
    with pytest.raises(TypeError):
        resample_returns(rdf, lambda s: "nope", num_trials=1)


def test_poisson_replicate_counts(spark, rdf):
    rep = bootstrap_replicate(rdf, num_trials=200, seed=1)
    counts = rep.groupBy("trial").count().collect()
    # each trial resamples ~n rows (Poisson(1) per row): mean ~8, sd ~2.8
    mean_n = statistics.mean(r["count"] for r in counts)
    assert 6.0 < mean_n < 10.0


def test_poisson_bootstrap_stats(spark, rdf):
    out = resample_returns_poisson(rdf, {"mean_r": F.avg("r")}, num_trials=300, seed=3)
    rows = out.collect()
    assert len(rows) >= 295  # a trial can be empty (all counts 0) rarely
    grand = statistics.mean(r["mean_r"] for r in rows)
    assert grand == pytest.approx(statistics.mean(RETURNS), abs=0.01)
