"""SCD2 merge semantics: change detection, version bracketing, null-safe
attribute comparison, closed-history passthrough."""

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ffn_polars_spark.operators.scd import scd2_merge

DIM_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("tier", StringType()),
        StructField("valid_from", LongType()),
        StructField("valid_to", LongType()),
    ]
)


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, ["k", "tier", "ts_ns"])


def test_scd2_from_scratch_builds_version_chain(spark):
    upd = _upd(
        spark,
        [(1, "a", 10), (1, "a", 20), (1, "b", 30), (1, "a", 40), (2, "x", 5)],
    )
    out = sorted(
        scd2_merge(_dim(spark, []), upd, "k", ["tier"]).collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    got = [(r.k, r.tier, r.valid_from, r.valid_to) for r in out]
    # unchanged snapshot at ts=20 opens nothing; each change closes the prior
    assert got == [
        (1, "a", 10, 30),
        (1, "b", 30, 40),
        (1, "a", 40, None),
        (2, "x", 5, None),
    ]


def test_scd2_incremental_merge_keeps_closed_history(spark):
    dim = _dim(
        spark,
        [
            (1, "old", 1, 10),    # closed history: must pass through verbatim
            (1, "a", 10, None),   # open version
        ],
    )
    upd = _upd(spark, [(1, "a", 50), (1, "b", 100)])
    out = sorted(
        scd2_merge(dim, upd, "k", ["tier"]).collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    got = [(r.k, r.tier, r.valid_from, r.valid_to) for r in out]
    assert got == [
        (1, "old", 1, 10),
        (1, "a", 10, 100),   # open version closed at the change, not at 50
        (1, "b", 100, None),
    ]


def test_scd2_null_attribute_is_a_value(spark):
    upd = _upd(spark, [(1, "a", 10), (1, None, 20), (1, None, 30), (1, "a", 40)])
    out = sorted(
        scd2_merge(_dim(spark, []), upd, "k", ["tier"]).collect(),
        key=lambda r: r.valid_from,
    )
    got = [(r.tier, r.valid_from, r.valid_to) for r in out]
    # a -> NULL opens a version; NULL -> NULL does not; NULL -> a does
    assert got == [("a", 10, 20), (None, 20, 40), ("a", 40, None)]


def test_scd2_multi_attribute_change_detection(spark):
    dim_schema = StructType(
        [
            StructField("k", LongType()),
            StructField("t1", IntegerType()),
            StructField("t2", IntegerType()),
            StructField("valid_from", LongType()),
            StructField("valid_to", LongType()),
        ]
    )
    upd = spark.createDataFrame(
        [(1, 1, 1, 10), (1, 1, 2, 20), (1, 1, 2, 30)],
        ["k", "t1", "t2", "ts_ns"],
    )
    out = sorted(
        scd2_merge(
            spark.createDataFrame([], dim_schema), upd, "k", ["t1", "t2"]
        ).collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.t1, r.t2, r.valid_from, r.valid_to) for r in out] == [
        (1, 1, 10, 20),
        (1, 2, 20, None),
    ]


def test_scd2_asof_join_picks_the_right_version(spark):
    from ffn_polars_spark.operators.scd import scd2_asof_join

    dim = _dim(
        spark,
        [(1, "a", 10, 30), (1, "b", 30, None), (2, "x", 100, None)],
    )
    facts = spark.createDataFrame(
        [(101, 1, 15), (102, 1, 30), (103, 1, 29), (104, 2, 50), (105, 3, 1)],
        ["fact_id", "k", "ts_ns"],
    )
    out = {r.fact_id: r for r in scd2_asof_join(facts, dim, "k").collect()}
    assert out[101].tier == "a"          # inside [10, 30)
    assert out[103].tier == "a"          # boundary-1
    assert out[102].tier == "b"          # valid_to is EXCLUSIVE: 30 -> "b"
    assert out[104].tier is None         # before user 2's first version
    assert out[105].tier is None         # unknown key kept (left join)
    assert len(out) == 5                 # output stays fact-sized


def test_join_profile_orphans_unused_and_fanout(spark):
    from ffn_polars_spark.operators.quality import join_profile

    facts = spark.createDataFrame(
        [(1, "f1"), (1, "f2"), (2, "f3"), (9, "f4"), (None, "f5")],
        ["k", "payload"],
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    r = join_profile(facts, dim, "k", "k").collect()[0]
    assert r.n_facts == 5
    assert r.n_null_keys == 1
    assert r.n_orphan_facts == 1        # k=9
    assert r.match_rate == 0.6          # 3 of 5 facts match (k=1 x2, k=2)
    assert r.n_dim_keys == 3
    assert r.n_unused_dim_keys == 1     # k=3
    assert r.max_fanout == 2 and r.avg_fanout == 1.5


def test_detect_gaps_merges_runs_and_bounds_range(spark):
    from ffn_polars_spark.operators.quality import detect_gaps

    M = 60_000_000_000
    rows = [
        ("A", 0), ("A", 1 * M), ("A", 5 * M), ("A", 6 * M), ("A", 9 * M),
        ("B", 0), ("B", 1 * M),   # no gaps
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts_ns"])
    out = sorted(
        detect_gaps(df, bucket_ns=M).collect(),
        key=lambda r: (r.event_type, r.gap_start_bucket),
    )
    got = [
        (r.event_type, r.gap_start_bucket, r.gap_end_bucket, r.n_missing)
        for r in out
    ]
    # A active at buckets {0,1,5,6,9}: gaps [2..4] and [7..8]; B has none;
    # nothing outside each key's own [min, max] range is reported
    assert got == [("A", 2, 4, 3), ("A", 7, 8, 2)]


def test_snapshot_diff_all_four_statuses(spark):
    from ffn_polars_spark.operators.quality import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        ["doc_id", "text"],
    )
    v2 = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.status for r in snapshot_diff(v1, v2).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
