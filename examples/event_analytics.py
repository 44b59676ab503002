"""Event-journey analytics on the driver testdata: ordered funnels, weekly
cohort retention, robust outlier screening, and live heavy hitters.

Run: python examples/event_analytics.py [sf_dir]   (default /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffn_polars_spark.sources import get_spark, read_table, ts_ns_col


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("events-example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from ffn_polars_spark.operators.funnel import cohort_retention, funnel_stages
    from ffn_polars_spark.operators.sketch import quantile_bin

    ev = read_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_ns", ts_ns_col(ev))

    # 1. ordered conversion funnel: users whose FIRST view precedes their
    #    first click precedes their first purchase
    funnel_stages(ev, ["view", "click", "purchase"]).show()

    # 2. weekly cohorts: of the users who first appeared in week W, how
    #    many were active k weeks later?
    cohort_retention(ev).orderBy("cohort_start", "offset").show(8)

    # 3. per-type value quartiles (exact ntile; approx=True for the
    #    sort-free percentile-cut path at scale)
    quantile_bin(
        ev.select("event_id", "event_type", "value"),
        "value", nbins=4, group_by=["event_type"], tiebreak="event_id",
    ).groupBy("event_type", "bin").count().orderBy("event_type", "bin").show(8)

    # 3b. ingest gates: does the fact table still join, and are there
    #     holes in the tape? then a leakage-safe temporal split
    from ffn_polars_spark.operators.pipeline import time_split
    from ffn_polars_spark.operators.quality import detect_gaps, join_profile

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    join_profile(lineitem, orders, "l_orderkey", "o_orderkey").show()
    detect_gaps(ev, bucket_ns=3600 * 10**9).groupBy("event_type").count().show()
    time_split(ev, train_frac=0.8).groupBy("split").count().show()

    # 4. live heavy hitters over the same events replayed as a stream
    from ffn_polars_spark.streaming import (
        read_tick_stream,
        run_available_now,
        streaming_topk,
    )
    from ffn_polars_spark.queries import _stage_stream_dir

    stage = _stage_stream_dir(sf_dir, "events", "ffn_stream")
    stream = read_tick_stream(spark, stage, ts_col="ts")
    run_available_now(
        streaming_topk(stream, ["user_id"], k=5), output_mode="complete"
    ).show()

    # Distribution drift between two event populations (KS gate)
    from ffn_polars_spark.operators.quality import ks_drift

    ks_drift(ev, "value", "event_type", "click", "view").show()
    from ffn_polars_spark.operators.quality import psi_drift

    psi_drift(
        ev, "value", "event_type", "click", "view", lo=0.0, width=2.0
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
