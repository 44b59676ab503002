"""Salting rewrites must be result-identical to their direct forms."""

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.operators.skew import salted_agg, salted_join
from ffn_polars_spark.sources import read_table

SF = "/root/testdata/sf0.001"


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
