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


def test_interval_union_merges_overlaps(spark):
    from ffn_polars_spark.operators.ranges import interval_union

    # [0,10] u [5,15] u [20,25]: covered 20, 2 islands, max 15
    rows = [("a", 0.0, 10.0), ("a", 5.0, 15.0), ("a", 20.0, 25.0)]
    r = interval_union(
        spark.createDataFrame(rows, ["k", "s", "e"]), "s", "e", by="k"
    ).collect()[0]
    assert r["covered"] == 20.0
    assert r["n_islands"] == 2
    assert r["max_island"] == 15.0
    assert r["n_intervals"] == 3


def test_interval_union_touching_intervals_merge(spark):
    from ffn_polars_spark.operators.ranges import interval_union

    # [0,5] and [5,10] touch -> one island of length 10
    rows = [("a", 0.0, 5.0), ("a", 5.0, 10.0)]
    r = interval_union(
        spark.createDataFrame(rows, ["k", "s", "e"]), "s", "e", by="k"
    ).collect()[0]
    assert r["n_islands"] == 1 and r["covered"] == 10.0


def test_interval_union_contained_interval_does_not_split(spark):
    from ffn_polars_spark.operators.ranges import interval_union

    # [0,100] contains [10,20]; a later [30,40] must NOT start a new
    # island (running-max, not previous-row-end, is the sweep state)
    rows = [("a", 0.0, 100.0), ("a", 10.0, 20.0), ("a", 30.0, 40.0)]
    r = interval_union(
        spark.createDataFrame(rows, ["k", "s", "e"]), "s", "e", by="k"
    ).collect()[0]
    assert r["n_islands"] == 1 and r["covered"] == 100.0


def test_radius_join_finds_exactly_near_pairs(spark):
    from ffn_polars_spark.operators.spatial import radius_join

    # points on a line at 0, 1, 3, 10 with r=2: pairs (1,2) d=1, (2,3) d=2
    rows = [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 3.0, 0.0), (4, 10.0, 0.0)]
    out = radius_join(
        spark.createDataFrame(rows, ["id", "x", "y"]), "id", "x", "y", 2.0
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in out}
    assert got == {(1, 2): 1.0, (2, 3): 2.0}


def test_radius_join_cross_cell_boundary(spark):
    from ffn_polars_spark.operators.spatial import radius_join

    # two points in different grid cells but within r: the 3x3 neighbor
    # fan-out must find them; and each pair appears exactly once
    rows = [(1, 0.9, 0.9), (2, 1.1, 1.1)]
    out = radius_join(
        spark.createDataFrame(rows, ["id", "x", "y"]), "id", "x", "y", 1.0
    ).collect()
    assert len(out) == 1
    assert abs(out[0]["distance"] - (0.08) ** 0.5) < 1e-12


def test_interval_diff_partition(spark):
    from ffn_polars_spark.operators.ranges import interval_diff

    # A = [0,10); B = [5,20): only_a [0,5)=5, both [5,10)=5, only_b [10,20)=10
    a = spark.createDataFrame([(0.0, 10.0)], ["s", "e"])
    b = spark.createDataFrame([(5.0, 20.0)], ["s", "e"])
    r = interval_diff(a, b, "s", "e").collect()[0]
    assert r["only_a"] == 5.0 and r["both"] == 5.0 and r["only_b"] == 10.0
    assert r["total_a"] == 10.0 and r["total_b"] == 15.0


def test_interval_diff_half_open_touching(spark):
    from ffn_polars_spark.operators.ranges import interval_diff

    # A ends exactly where B starts: zero overlap under [s, e)
    a = spark.createDataFrame([(0.0, 5.0)], ["s", "e"])
    b = spark.createDataFrame([(5.0, 8.0)], ["s", "e"])
    r = interval_diff(a, b, "s", "e").collect()[0]
    assert r["both"] == 0.0 and r["only_a"] == 5.0 and r["only_b"] == 3.0


def test_interval_diff_self_overlapping_sets(spark):
    from ffn_polars_spark.operators.ranges import interval_diff

    # A overlaps itself ([0,10) u [5,15) = [0,15)); counters, not flags,
    # keep the sweep correct
    a = spark.createDataFrame([(0.0, 10.0), (5.0, 15.0)], ["s", "e"])
    b = spark.createDataFrame([(12.0, 20.0)], ["s", "e"])
    r = interval_diff(a, b, "s", "e").collect()[0]
    assert r["total_a"] == 15.0
    assert r["both"] == 3.0 and r["only_a"] == 12.0 and r["only_b"] == 5.0
