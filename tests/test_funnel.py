"""Funnel/cohort analytics: ordered-progress semantics on planted
journeys, retention normalization, quantile-bin contracts."""

from pyspark.sql import functions as F

from ffn_polars_spark.operators.funnel import cohort_retention, funnel_stages
from ffn_polars_spark.operators.sketch import quantile_bin

WEEK = 7 * 24 * 3600 * 1_000_000_000


def test_funnel_counts_ordered_progress_only(spark):
    rows = [
        # u1: full journey in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: clicked before viewing -> stuck at stage 0
        (2, "click", 10), (2, "view", 20),
        # u3: view then click, no purchase
        (3, "view", 10), (3, "click", 15),
        # u4: purchase only -> no view, not even stage 0
        (4, "purchase", 5),
        # u5: view+click simultaneous (strict < fails) -> stage 0 only
        (5, "view", 7), (5, "click", 7),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_ns"])
    out = {r.stage: r for r in funnel_stages(df, ["view", "click", "purchase"]).collect()}
    assert out[0].n_users == 4  # u1, u2, u3, u5 viewed
    assert out[1].n_users == 2  # u1, u3 viewed-then-clicked
    assert out[2].n_users == 1  # u1 completed
    assert out[0].conversion == 1.0
    assert out[1].conversion == 0.5
    assert out[2].conversion == 0.5
    assert out[1].stage_name == "click"


def test_funnel_rejects_empty_stages(spark):
    import pytest

    df = spark.createDataFrame([(1, "view", 1)], ["user_id", "event_type", "ts_ns"])
    with pytest.raises(ValueError):
        funnel_stages(df, [])


def test_cohort_retention_offsets_and_normalization(spark):
    rows = [
        # cohort A (week 0): u1 active weeks 0,1,2; u2 weeks 0,2
        (1, 0), (1, WEEK + 5), (1, 2 * WEEK + 5),
        (2, 10), (2, 2 * WEEK + 10),
        # cohort B (week 1): u3 active weeks 1 only
        (3, WEEK + 1),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_ns"])
    out = {
        (r.cohort_start, r.offset): r
        for r in cohort_retention(df, period_ns=WEEK).collect()
    }
    assert out[(0, 0)].n_users == 2 and out[(0, 0)].retention == 1.0
    assert out[(0, 1)].n_users == 1 and out[(0, 1)].retention == 0.5
    assert out[(0, 2)].n_users == 2 and out[(0, 2)].retention == 1.0
    assert out[(WEEK, 0)].n_users == 1
    assert (0, 3) not in out  # no activity -> no row (sparse output)


def test_cohort_retention_max_offset(spark):
    rows = [(1, 0), (1, 5 * WEEK)]
    df = spark.createDataFrame(rows, ["user_id", "ts_ns"])
    offs = {r.offset for r in cohort_retention(df, period_ns=WEEK, max_offset=2).collect()}
    assert offs == {0}


def test_quantile_bin_exact_and_approx_agree_on_distinct_values(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("x"),
    )
    exact = quantile_bin(df, "x", nbins=4, group_by=["g"], tiebreak="event_id")
    # equal-size tiles: 200 rows per group -> 50 per bin
    sizes = {
        (r.g, r.bin): r["count"]
        for r in exact.groupBy("g", "bin").count().collect()
    }
    assert set(sizes.values()) == {50}
    # approx path: same binning contract (1-based, nbins values), sizes
    # close to equal on distinct uniform values
    approx = quantile_bin(df, "x", nbins=4, group_by=["g"], approx=True)
    asizes = approx.groupBy("g", "bin").count().collect()
    assert {r.bin for r in asizes} == {1, 2, 3, 4}
    assert all(30 <= r["count"] <= 70 for r in asizes)


def test_transition_matrix_counts_and_row_probs(spark):
    rows = [
        (1, "a", 1), (1, "b", 2), (1, "a", 3), (1, "b", 4),
        (2, "a", 1), (2, "c", 2),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_ns"])
    from ffn_polars_spark.operators.funnel import transition_matrix

    out = {(r.from_type, r.to_type): r for r in transition_matrix(df).collect()}
    # u1: a->b, b->a, a->b; u2: a->c  (no cross-user transition)
    assert out[("a", "b")].n == 2
    assert out[("b", "a")].n == 1
    assert out[("a", "c")].n == 1
    assert ("c", "a") not in out  # session ends, no wraparound
    # rows normalize: P(b|a) = 2/3, P(c|a) = 1/3
    assert out[("a", "b")].prob == round(2 / 3, 6)
    assert out[("a", "c")].prob == round(1 / 3, 6)
    assert out[("b", "a")].prob == 1.0


def test_event_ngrams_counts_consecutive_paths(spark):
    from ffn_polars_spark.operators.funnel import event_ngrams
    rows = [("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"), ("u1", 4, "b"),
            ("u2", 1, "a"), ("u2", 2, "b")]
    out = event_ngrams(
        spark.createDataFrame(rows, ["k", "ts", "item"]), "ts", "k", "item", n=2
    ).collect()
    got = {r["gram"]: r for r in out}
    assert got["a->b"]["n_occurrences"] == 3
    assert got["a->b"]["n_keys"] == 2
    assert got["b->a"]["n_occurrences"] == 1
    assert got["b->a"]["n_keys"] == 1
    # no gram crosses a key boundary: u1's last b never pairs with u2's a
    assert set(got) == {"a->b", "b->a"}


def test_event_ngrams_trigram_needs_full_window(spark):
    from ffn_polars_spark.operators.funnel import event_ngrams
    rows = [("u", 1, "x"), ("u", 2, "y")]
    out = event_ngrams(
        spark.createDataFrame(rows, ["k", "ts", "item"]), "ts", "k", "item", n=3
    )
    assert out.count() == 0  # only 2 events: no complete trigram


def test_transition_entropy_deterministic_and_uniform(spark):
    from ffn_polars_spark.operators.funnel import transition_entropy

    # user u1: a->b, b->a, a->b  (a goes to b always: H=0; b->a always: H=0)
    # user u2: a->c              (second successor for a -> H(a) > 0)
    rows = [
        ("u1", 0, "a"), ("u1", 1, "b"), ("u1", 2, "a"), ("u1", 3, "b"),
        ("u2", 0, "a"), ("u2", 1, "c"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_ns", "event_type"])
    out = {r["from_type"]: r for r in transition_entropy(df).collect()}
    # a: 2x ->b, 1x ->c: H = -(2/3 log2 2/3 + 1/3 log2 1/3)
    import math
    ha = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert abs(out["a"]["entropy"] - ha) < 1e-12
    assert out["a"]["n_out"] == 2 and out["a"]["n"] == 3
    assert out["b"]["entropy"] == 0.0
    # 4 transitions total (3 from a, 1 from b):
    # overall = sum H(x) * n_x / n_total = ha * 3/4
    assert abs(out["__overall__"]["entropy"] - ha * 3 / 4) < 1e-12
    assert out["__overall__"]["n"] == 4


def test_time_to_convert_order_enforced(spark):
    from ffn_polars_spark.operators.funnel import time_to_convert

    rows = [
        # u1 converts 5s after first view (second purchase ignored)
        ("u1", "view", 10.0), ("u1", "purchase", 15.0), ("u1", "purchase", 20.0),
        # u2 purchased BEFORE viewing: started but not converted
        ("u2", "purchase", 5.0), ("u2", "view", 9.0),
        # u3 never viewed: not started at all
        ("u3", "purchase", 1.0),
    ]
    r = time_to_convert(
        spark.createDataFrame(rows, ["u", "t", "ts"]),
        "u", "t", "ts", "view", "purchase", quantiles=(0.5,),
    ).collect()[0]
    assert r["n_started"] == 2
    assert r["n_converted"] == 1
    assert abs(r["conversion_rate"] - 0.5) < 1e-12
    assert r["p50_delta"] == 5.0


def test_time_to_convert_same_instant_counts(spark):
    from ffn_polars_spark.operators.funnel import time_to_convert

    # conversion at the exact timestamp of the source event counts
    # (the seen-flag window is inclusive of the current row's instant
    # when the source sorts first; here view sorts before purchase in
    # arrival order via distinct timestamps)
    rows = [("u1", "view", 10.0), ("u1", "purchase", 10.5)]
    r = time_to_convert(
        spark.createDataFrame(rows, ["u", "t", "ts"]),
        "u", "t", "ts", "view", "purchase", quantiles=(0.5,),
    ).collect()[0]
    assert r["n_converted"] == 1 and r["p50_delta"] == 0.5


def test_session_paths_orders_and_truncates(spark):
    from ffn_polars_spark.operators.funnel import session_paths

    rows = (
        [("u1", t, e) for t, e in [(1, "a"), (2, "b"), (3, "c")]]
        + [("u2", t, e) for t, e in [(5, "a"), (6, "b"), (7, "c")]]
        + [("u3", t, e) for t, e in [(1, "x"), (2, "y")]]
    )
    out = session_paths(
        spark.createDataFrame(rows, ["u", "ts", "t"]), "u", "t", "ts",
        max_events=2, top_k=10,
    ).collect()
    got = {r["path"]: r for r in out}
    assert got["a->b"]["n_users"] == 2 and got["a->b"]["rank"] == 1
    assert got["x->y"]["n_users"] == 1
    assert "a->b->c" not in got  # truncated at max_events


def test_session_paths_top_k_ties_break_on_path(spark):
    from ffn_polars_spark.operators.funnel import session_paths

    rows = [("u1", 1, "a"), ("u2", 1, "b"), ("u3", 1, "c")]
    out = session_paths(
        spark.createDataFrame(rows, ["u", "ts", "t"]), "u", "t", "ts",
        max_events=3, top_k=2,
    ).collect()
    assert [r["path"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "a", "b",
    ]
