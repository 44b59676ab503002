"""Source/sink helpers: partitioned writes prune at scan time, bucketed
tables join without exchanges."""

import os

from tests.conftest import TESTDATA

from pyspark.sql import functions as F

from ffn_polars_spark.plans import count_exchanges, explain_str
from ffn_polars_spark.sources import read_table, ts_ns_col, write_bucketed, write_table


def test_tick_ingestion_contract_all_sf(spark):
    """The round-3 regression class: the driver regenerated events.parquet
    with ts as timestamp[us] instead of TIMESTAMP(NANOS) and every query
    through ticks() died at analysis.  This contract test reads every
    shipped scale factor and pins the canonical tick schema, so the next
    silent testdata change fails here, not in the driver's gate."""
    from ffn_polars_spark.queries import ticks

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = os.path.join(TESTDATA, sf)
        if not os.path.exists(os.path.join(d, "events.parquet")):
            continue
        t = ticks(spark, d)
        types = {f.name: f.dataType.simpleString() for f in t.schema.fields}
        assert types["ts_ns"] == "bigint", (sf, types)
        assert types["price"] == "double" and types["volume"] == "double"
        rows = t.select("ts_ns").limit(5).collect()
        assert rows and all(r.ts_ns % 1000 == 0 for r in rows), sf  # µs-aligned
        checked += 1
    assert checked >= 1  # all present sfs pinned (canonical env ships 3)


def test_ts_ns_col_dispatches_on_dtype(spark):
    """ts_ns_col must yield identical epoch-ns for the same instant whether
    ts was read as epoch-ns LongType (nanosAsLong) or as a timestamp."""
    import datetime

    ns = 1_700_000_000_123_456_789
    long_df = spark.createDataFrame([(ns,)], "ts long")
    ts_df = spark.createDataFrame(
        [(datetime.datetime.utcfromtimestamp(ns / 1e9),)], "ts timestamp"
    ).select(F.timestamp_micros(F.lit(ns // 1000)).alias("ts"))
    a = long_df.select(ts_ns_col(long_df).alias("ts_ns")).first().ts_ns
    b = ts_df.select(ts_ns_col(ts_df).alias("ts_ns")).first().ts_ns
    assert a == b == (ns // 1000) * 1000


def test_write_table_partitioned_prunes(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = read_table(spark, f"{TESTDATA}/sf0.001", "events")
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
    ev = read_table(spark, f"{TESTDATA}/sf0.001", "events").select(
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


def test_jsonl_roundtrip_preserves_tricky_text(spark, tmp_path):
    from pyspark.sql import functions as F

    from ffn_polars_spark.sources import read_jsonl, write_jsonl

    rows = [
        (1, 'quotes "inside" and \\ backslash'),
        (2, "newline\nand\ttab"),
        (3, "unicode: café — 日本語 \U0001f600"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "docs")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == {r[0]: r[1] for r in rows}
    # explicit schema: no inference pass, types preserved exactly
    assert back.schema == df.schema
    # compressed write round-trips too
    write_jsonl(df, path + "_gz", compression="gzip")
    assert read_jsonl(spark, path + "_gz", schema=df.schema).count() == 5


def test_csv_roundtrip_adversarial_text(spark, tmp_path):
    from ffn_polars_spark.sources import read_csv, write_csv

    rows = [
        (1, 'line1\nline2', "en"),
        (2, 'quote " and , comma', "en"),
        (3, "unicode éè中文 \U0001f600", "zh"),
        (4, "", "en"),
        (5, None, "en"),
        (6, "  leading and trailing spaces  ", "en"),
    ]
    df = spark.createDataFrame(rows, ["id", "text", "lang"])
    p = str(tmp_path / "csv_rt")
    write_csv(df, p)
    back = read_csv(spark, p, schema=df.schema)
    got = {r.id: (r.text, r.lang) for r in back.collect()}
    want = {i: (t, l) for i, t, l in rows}
    # empty string and NULL both survive as empty/NULL-ish; everything
    # else must be byte-exact
    for i in (1, 2, 3, 6):
        assert got[i] == want[i], i
    assert got[4][0] in ("", None) and got[5][0] in ("", None)


def test_orc_roundtrip_exact(spark, tmp_path):
    from ffn_polars_spark.sources import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a\nb", 1.5), (2, None, None)], ["id", "t", "v"]
    )
    p = str(tmp_path / "orc_rt")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert sorted(back.collect()) == sorted(df.collect())
    assert back.schema == df.schema
