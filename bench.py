"""Headline benchmark: representative engine queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized through the noop sink (full execution, no driver
collect). The set spans the engine's plan shapes: scan+agg, multi-join,
window top-k, partitioned window series, window+agg two-phase, as-of join,
MinHash dedup, ANN top-k, sessionization, distributed bootstrap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ffn_polars_spark.sources import get_spark

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "to_returns",
    "calc_realized_volatility",
    "calc_vwap",
    "time_bars",
    "quote_analytics",
    "asof_join_backward",
    "session_stats",
    "resample_returns_poisson",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    spark = get_spark(app_name="ffn-polars-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from ffn_polars_spark.queries import QUERY_FNS

    # JVM/codegen + Python-worker warmup outside the timed region (the
    # Arrow-kernel queries otherwise pay ~5s of worker spawn + pandas import
    # on their first use in a session).
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(1000, numPartitions=32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    timings = {}
    for name in HEADLINE:
        fn = QUERY_FNS[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
