"""Headline benchmark: representative engine queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS].

The LAST line of stdout is the compact headline JSON the driver parses:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "queries_median": {...},
   "runs": N}
Diagnostics (per-stage breakdowns of the 3 slowest queries) print on their
own earlier stdout lines so the headline line stays under the driver's
~2000-char tail capture.

Each query is materialized through the noop sink (full execution, no driver
collect). The set spans the engine's plan shapes: scan+agg, multi-join,
window top-k, partitioned window series, window+agg two-phase, as-of join,
MinHash dedup, ANN top-k, sessionization, distributed bootstrap.

Methodology (variance robustness): each query runs SPARK_GRAFT_BENCH_RUNS
times (default 5), interleaved (full pass 1, pass 2, ...) so one of this
box's multi-second slowdown episodes cannot cover all of a query's samples.
``queries``/``value`` report the per-query MIN — the box's noise is strictly
one-sided (episodes make every query uniformly 2-6x slower; back-to-back
identical runs have measured 21s and 63s totals), so the min is the
consistent estimator of true plan cost and agrees run-to-run within ~1.15x
where medians still swing ~1.8x. ``queries_median`` is included as the
noise indicator: median >> min means the run was taken during an episode.
A scan + pandas_udf warmup runs untimed first so the Python-worker spawn
(~5s) never lands in any timed region.

Canary (round-12): a FIXED inline scan+agg over lineitem — independent of
every catalog entry, its plan can never change with engine edits — runs
interleaved alongside the headline set. ``canary_s`` (its min) measures
the BOX, not the code: round-over-round, a headline total that moved with
the canary is environment noise; one that moved against a flat canary is
a real regression. ``value_canary_normalized`` = value *
(CANARY_BASELINE_S / canary_s) is the mechanically comparable total
(see BASELINE.md "Canary normalization").
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
    "ann_topk_ivf",
    "text_quality",
    "clean_corpus",
]


# Quiet-box canary cost, pinned from a clean min-of-5 at sf0.1 on the
# reference box (round 12). If the hardware or Spark version changes, re-pin
# and note it in BASELINE.md; do NOT re-pin to absorb a code regression —
# the canary is catalog-independent, so code changes cannot move it.
CANARY_BASELINE_S = 0.247  # min-of-5 at sf0.1, quiet box, round 12


def _canary(spark, sf_dir):
    """Fixed scan+agg whose plan never changes: full lineitem scan, four
    numeric aggregates. No catalog code involved — measures the box."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return df.agg(
        F.sum("l_extendedprice").alias("s1"),
        F.sum("l_quantity").alias("s2"),
        F.avg("l_discount").alias("a1"),
        F.count(F.lit(1)).alias("n"),
    )


def _fetch_stages(web_url: str, app_id: str):
    """COMPLETE stages from the UI REST API as {stageId: summary-dict}."""
    import urllib.request

    with urllib.request.urlopen(
        f"{web_url}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
    ) as r:
        stages = json.loads(r.read().decode())
    return {s["stageId"]: s for s in stages}


def _stage_breakdown(spark, fn, sf_dir, web_url: str, app_id: str):
    """One instrumented run of ``fn``: returns the run's new stages, heaviest
    first, so a future bench regression is localizable to a stage without a
    rerun. executorRunTime is summed task time (CPU-parallel), so it can
    exceed the wall-clock query time."""
    before = set(_fetch_stages(web_url, app_id))
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    after = _fetch_stages(web_url, app_id)
    new = [s for sid, s in after.items() if sid not in before]
    new.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    return [
        {
            "stage": s["stageId"],
            "name": s.get("name", "")[:100],
            "run_ms": s.get("executorRunTime", 0),
            "tasks": s.get("numCompleteTasks", 0),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
        }
        for s in new  # callers slice for display; task-time sums need all
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    # the stage-metrics pass reads the UI REST API; enable the UI unless the
    # caller explicitly disabled it (SPARK_GRAFT_UI=false skips the pass)
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
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

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    samples = {name: [] for name in HEADLINE}
    errors: dict = {}
    # Interleave runs (full pass 1, full pass 2, ...) rather than timing each
    # query back-to-back-to-back: environmental slowdowns on this box arrive
    # in multi-second episodes, so interleaving decorrelates a query's three
    # samples and the median sees at least one clean pass.
    #
    # Fail-soft per query: one broken entry must never zero the whole file
    # (round 3 lost every number to a single AnalysisException on the first
    # query).  An erroring query is skipped for the rest of the run and
    # reported under "errors".
    canary_samples: list = []
    for _ in range(n_runs):
        t0 = time.time()
        _canary(spark, sf_dir).write.format("noop").mode("overwrite").save()
        canary_samples.append(time.time() - t0)
        for name in HEADLINE:
            if name in errors:
                continue
            fn = QUERY_FNS[name]
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — bench must survive anything
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                samples[name] = []
                continue
            samples[name].append(time.time() - t0)

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

    med = {name: round(median(v), 3) for name, v in samples.items() if v}
    mins = {name: round(min(v), 3) for name, v in samples.items() if v}

    # Per-stage breakdown for the 3 most expensive queries (one extra
    # untimed run each, outside every timed region): localizes a future
    # regression to a stage without a rerun. r14: the same instrumented
    # pass now covers EVERY query, summing executor task-time per query
    # (task_ms) — the scaling disambiguator: a query whose low-core/high-
    # core WALL ratio is ≈1 while its task-time is unchanged is at the
    # scheduling-latency floor (per-task overhead >> per-row cost at this
    # SF), not serial; a genuinely serial query would show task-time ≈
    # wall at every core count.
    stage_metrics = {}
    task_ms = {}
    web_url = spark.sparkContext.uiWebUrl
    if web_url:
        app_id = spark.sparkContext.applicationId
        top3 = set(sorted(mins, key=mins.get, reverse=True)[:3])
        for name in mins:
            try:
                stages = _stage_breakdown(
                    spark, QUERY_FNS[name], sf_dir, web_url, app_id
                )
                task_ms[name] = sum(s["run_ms"] for s in stages)
                if name in top3:
                    stage_metrics[name] = stages[:5]
            except Exception:  # noqa: BLE001 — metrics must never break bench
                pass

    # Diagnostics print on their OWN lines BEFORE the headline object: the
    # driver parses only the final stdout line and its tail capture is
    # ~2000 chars — round 9 lost its driver perf record because the
    # stage-metrics map inlined into the headline object pushed the single
    # line past that cap (`BENCH_r09.json` parsed: null).
    if stage_metrics:
        print(json.dumps({"stage_metrics": stage_metrics}))
    if task_ms:
        # own compact line directly before the headline so the driver's
        # ~2000-char tail capture keeps it: per-query summed executor
        # task-time (CPU-parallel; can exceed wall) from the instrumented
        # pass — reads a flat wall ratio at a lower core count as "floor"
        # vs "serial" without a rerun.
        print(json.dumps({"queries_task_ms": task_ms}))

    canary_s = round(min(canary_samples), 3)
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "queries": mins,
        "sf": sf,
        "queries_median": med,
        "runs": n_runs,
        "canary_s": canary_s,
        "canary_median_s": round(median(canary_samples), 3),
    }
    # canary_s can round to 0.0 on a tiny SF dir — never let the
    # normalization ZeroDivisionError kill the whole bench record
    if CANARY_BASELINE_S and canary_s > 0:
        out["canary_baseline_s"] = CANARY_BASELINE_S
        out["value_canary_normalized"] = round(
            sum(mins.values()) * CANARY_BASELINE_S / canary_s, 3
        )
    if errors:
        # A partial total is silently incomparable across rounds (it sums a
        # smaller query set and looks *better*); flag it explicitly.
        out["errors"] = errors
        out["incomplete"] = True
    # LAST stdout line: the compact headline JSON alone (driver contract).
    print(json.dumps(out))


if __name__ == "__main__":
    main()
