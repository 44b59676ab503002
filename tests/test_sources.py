"""Source/sink helpers: partitioned writes prune at scan time, bucketed
tables join without exchanges."""

import os

from pyspark.sql import functions as F

from ffn_polars_spark.plans import count_exchanges, explain_str
from ffn_polars_spark.sources import read_table, write_bucketed, write_table


def test_write_table_partitioned_prunes(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    write_table(ev, path, partition_by="event_type")
    # physical layout: one directory per event_type
    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(dirs) == 5
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # a partition-key filter must prune to PartitionFilters, not a row filter
    plan = explain_str(back.where(F.col("event_type") == "click"))
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]


def test_write_bucketed_joins_without_exchange(spark):
    # managed tables land in the session's spark-warehouse dir (static conf,
    # can't be redirected at runtime); dropped at the end
    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_id", "value"
    )
    write_bucketed(ev, "ev_a", bucket_by="user_id", num_buckets=8)
    write_bucketed(ev, "ev_b", bucket_by="user_id", num_buckets=8)
    a, b = spark.table("ev_a"), spark.table("ev_b")
    j = a.groupBy("user_id").agg(F.sum("value").alias("v")).join(
        b.groupBy("user_id").agg(F.count("*").alias("n")), "user_id"
    )
    # both sides pre-bucketed on the key: no shuffle anywhere in the plan
    assert count_exchanges(j) == 0
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS ev_a")
    spark.sql("DROP TABLE IF EXISTS ev_b")
