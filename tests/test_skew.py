"""Salting rewrites must be result-identical to their direct forms."""

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.operators.skew import salted_agg, salted_join
from ffn_polars_spark.sources import read_table

from tests.conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(SF), reason="testdata not present"
)


def test_salted_agg_matches_direct(spark):
    ev = read_table(spark, SF, "events")
    direct = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.avg("value").alias("m"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: r
        for r in salted_agg(
            ev,
            "event_type",
            {
                "n": ("count", "*"),
                "s": ("sum", "value"),
                "lo": ("min", "value"),
                "hi": ("max", "value"),
                "m": ("avg", "value"),
            },
            buckets=8,
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert salted[k]["n"] == direct[k]["n"]
        assert salted[k]["s"] == pytest.approx(direct[k]["s"], rel=1e-12)
        assert salted[k]["lo"] == direct[k]["lo"]
        assert salted[k]["hi"] == direct[k]["hi"]
        assert salted[k]["m"] == pytest.approx(direct[k]["m"], rel=1e-12)


def test_salted_agg_rejects_unknown(spark):
    ev = read_table(spark, SF, "events")
    with pytest.raises(ValueError, match="unsupported agg"):
        salted_agg(ev, "event_type", {"x": ("median", "value")})


def test_salted_join_matches_direct(spark):
    ev = read_table(spark, SF, "events").select("event_id", "user_id", "value")
    users = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    )
    direct = ev.join(users, "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_events").alias("s")
    ).collect()[0]
    salted = salted_join(ev, users, "user_id", buckets=4).agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_events").alias("s")
    ).collect()[0]
    assert salted["n"] == direct["n"]
    assert salted["s"] == direct["s"]


def test_salting_spreads_hot_key_partitions(spark):
    """The 100 TB skew story, measured: a key carrying ~90% of rows
    hot-spots one reducer under hash partitioning; salting bounds the
    largest reducer at roughly hot_share/buckets. Partition row counts are
    the deterministic proxy for task time."""
    n = 200_000
    buckets = 16
    df = spark.range(n).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('cold_', id % 37) END AS k",
        "CAST(id AS DOUBLE) AS v",
    )
    parts = 32

    def max_share(frame, *cols):
        sizes = (
            frame.repartition(parts, *[F.col(c) for c in cols])
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .count()
            .collect()
        )
        return max(r["count"] for r in sizes) / n

    unsalted = max_share(df, "k")
    salted = max_share(
        df.withColumn("__salt", (F.rand(7) * buckets).cast("int")), "k", "__salt"
    )
    assert unsalted >= 0.85  # the hot key serializes on one reducer
    assert salted <= 0.25  # spread over ~buckets reducers
    # and the salted_agg rewrite stays result-identical on this distribution
    direct = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    srows = {
        r["k"]: r["n"]
        for r in salted_agg(df, "k", {"n": ("count", "*")}, buckets=buckets).collect()
    }
    assert direct == srows


def test_aqe_splits_skewed_join(spark):
    """AQE's runtime skew-join split must engage on a pathological key —
    the first line of defense before explicit salting."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(120_000).selectExpr(
            "CASE WHEN id % 20 < 19 THEN 'hot' ELSE concat('c', id % 13) END AS k",
            "id AS v",
        )
        right = spark.createDataFrame(
            [("hot", 1.0)] + [(f"c{i}", float(i)) for i in range(13)], ["k", "w"]
        )
        joined = left.join(right, "k")
        # act on the SAME DataFrame so its cached queryExecution finalizes
        # (a write creates a separate execution; this one would stay
        # isFinalPlan=false and show no runtime re-plan)
        assert len(joined.collect()) == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan[:2000]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
