"""interval_join: exact range semantics via bucket decomposition."""

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.operators.ranges import interval_join


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 25), ("b", 10), ("b", 99)],
        ["k", "ts"],
    )


@pytest.fixture(scope="module")
def ivs(spark):
    return spark.createDataFrame(
        [
            ("a", 0, 11, "i1"),    # catches a/5, a/10 (half-open: ts=11 would miss)
            ("a", 8, 30, "i2"),    # overlaps i1: a/10 matches both; catches a/25
            ("b", 90, 100, "i3"),  # catches b/99
            ("b", 200, 150, "i4"), # empty interval: matches nothing
        ],
        ["k", "start", "end", "tag"],
    )


def test_inner_matches_and_overlap(spark, pts, ivs):
    out = interval_join(pts, ivs, "ts", by=["k"], bucket=7)
    got = {(r["k"], r["ts"], r["tag"]) for r in out.collect()}
    assert got == {
        ("a", 5, "i1"),
        ("a", 10, "i1"),
        ("a", 10, "i2"),
        ("a", 25, "i2"),
        ("b", 99, "i3"),
    }


def test_bucket_width_invariance(spark, pts, ivs):
    ref = {(r["k"], r["ts"], r["tag"])
           for r in interval_join(pts, ivs, "ts", by=["k"], bucket=7).collect()}
    for b in (1, 3, 1000):
        got = {(r["k"], r["ts"], r["tag"])
               for r in interval_join(pts, ivs, "ts", by=["k"], bucket=b).collect()}
        assert got == ref, f"bucket={b}"


def test_left_keeps_unmatched(spark, pts, ivs):
    out = interval_join(pts, ivs, "ts", by=["k"], bucket=7, how="left")
    rows = out.collect()
    # 5 matches + 1 unmatched point (b/10)
    assert len(rows) == 6
    unmatched = [r for r in rows if r["tag"] is None]
    assert len(unmatched) == 1 and (unmatched[0]["k"], unmatched[0]["ts"]) == ("b", 10)


def test_how_contract(spark, pts, ivs):
    with pytest.raises(ValueError, match="how"):
        interval_join(pts, ivs, "ts", how="outer")
