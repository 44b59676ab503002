import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# Testdata root: the canonical driver-generated tables, overridable so CI
# and external users can point at tools/gen_testdata.py output.
TESTDATA = os.environ.get("FFN_TESTDATA_DIR", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .appName("ffn-polars-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session


@pytest.fixture(scope="session")
def golden(spark):
    """The reference's golden 10-year price CSV, if the reference checkout is
    present (tests relying on it skip otherwise)."""
    from ffn_polars_spark.sources import GOLDEN_CSV, load_golden_prices

    if not os.path.exists(GOLDEN_CSV):
        pytest.skip("reference golden CSV not available")
    return load_golden_prices(spark).cache()


def aae(actual, expected, places=3):
    """Round-and-compare helper matching the reference's tolerance contract
    (tests/utils.py:1-11)."""
    assert actual is not None, f"expected {expected}, got None"
    assert round(actual, places) == round(expected, places), (
        f"expected {expected}, got {actual} (places={places})"
    )
