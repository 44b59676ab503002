"""Range (interval) join: points × [start, end) intervals at scale.

The naive formulation — ``points JOIN intervals ON ts >= start AND ts <
end`` — has no equi-key, so Spark plans it as a broadcast-nested-loop (or
worse, a cartesian) join: every point row tests every interval. Fine for a
handful of intervals, catastrophic at 100 TB.

The scalable shape is the standard time-bucket decomposition: pick a bucket
width, explode each interval to the bucket ids it covers, compute each
point's single bucket id, equi-join on (keys..., bucket), then re-apply the
exact range predicate. Cost is |points| + Σ interval_spans/bucket rows
through one hash shuffle — both sides partition on a high-cardinality key,
and AQE handles skewed buckets. Bucket width trades index size (long
intervals explode to many buckets) against join selectivity (wide buckets
pull in more false candidates); a width near the median interval length is
a good default.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="interval_join")
def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start",
    end_col: str = "end",
    by: Optional[Sequence[str]] = None,
    bucket: int = 3_600_000_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with ``start <= ts < end``
    (and equal ``by`` keys). Points inside k overlapping intervals produce k
    output rows; ``how="left"`` also keeps unmatched points with null
    interval columns.

    ``bucket`` is the decomposition width in ``ts`` units (default 1h in
    ns). Results are bucket-width-invariant (exact predicate re-applied
    after the candidate equi-join); only the plan shape changes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left'; got {how!r}")
    keys = list(by or [])
    b = F.lit(int(bucket))

    # `div` (integer division), NOT `/`: float division of ns-epoch longs
    # (~1.7e18 > 2^53) silently loses the low bits. Timestamps are assumed
    # non-negative, where truncating div == floor.
    p = points.withColumn(
        "__bkt", F.expr(f"CAST({ts_col} AS BIGINT) div {int(bucket)}")
    )
    # half-open [start, end): the last covered bucket is the one holding
    # end-1; empty intervals (end <= start) cover nothing and drop out
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) div {int(bucket)}"),
                F.expr(f"(CAST({end_col} AS BIGINT) - 1) div {int(bucket)}"),
            )
        ),
    )
    on = [p["__bkt"] == iv["__bkt"]] + [p[k] == iv[k] for k in keys]
    matched = (
        p.join(iv, on, "inner")
        .where(
            (p[ts_col] >= iv[start_col]) & (p[ts_col] < iv[end_col])
        )
        .select(
            *[p[c] for c in points.columns],
            *[iv[c] for c in intervals.columns if c not in keys],
        )
    )
    if how == "inner":
        return matched
    # null-safe anti join: plain column-name equality would re-emit matched
    # points that carry nulls in any payload column
    iv_cols = [c for c in intervals.columns if c not in keys]
    m = matched.select(*points.columns).dropDuplicates()
    cond = None
    for c in points.columns:
        eq = points[c].eqNullSafe(m[c])
        cond = eq if cond is None else (cond & eq)
    unmatched = points.join(m, cond, "left_anti").select(
        *points.columns,
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_cols],
    )
    return matched.unionByName(unmatched)


@register(namespace="eod", kind="df", context="dataframe", alias="interval_union")
def interval_union(
    df: DataFrame,
    start_col: str,
    end_col: str,
    by=None,
) -> DataFrame:
    """Union of (possibly overlapping) intervals per key — total covered
    length, number of merged islands, and the largest island — the
    sweep-line answer to "how much wall-clock was this user/sensor/job
    actually active?" that naive ``Σ (end − start)`` double-counts the
    moment intervals overlap. The interval-algebra companion to
    [[interval_join]] (which pairs intervals; this one MERGES them) and
    to detect_gaps (which finds the holes; this measures the coverage).

    Classic gaps-and-islands: one ordered window per key — an island
    starts where ``start`` exceeds the running max of all previous ends
    (strictly: touching intervals merge) — then a cumulative island id
    and a per-island aggregate. Two window passes sharing ONE exchange
    (same partition+order), island cardinality after the first
    aggregate. Zero-length intervals are kept: they cover nothing and
    cannot bridge two islands, but a zero-length point PAST the running
    max correctly starts (and counts as) its own island. Returns
    ``(*keys, covered, n_islands, max_island, n_intervals)``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    base = df.select(
        *keys,
        F.col(start_col).cast("double").alias("__s"),
        F.col(end_col).cast("double").alias("__e"),
    )
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy("__s", "__e")
    prev_max_end = F.max(F.col("__e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
    ).otherwise(0)
    staged = base.withColumn("__new", is_new).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    isl = staged.groupBy(*keys, F.col("__island")).agg(
        F.min("__s").alias("__is"),
        F.max("__e").alias("__ie"),
        F.count(F.lit(1)).alias("__n"),
    )
    length = F.greatest(F.col("__ie") - F.col("__is"), F.lit(0.0))
    g = isl.groupBy(*keys) if keys else isl.groupBy()
    return g.agg(
        F.sum(length).alias("covered"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max(length).alias("max_island"),
        F.sum("__n").cast("long").alias("n_intervals"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="interval_diff")
def interval_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    start_col: str,
    end_col: str,
    by=None,
) -> DataFrame:
    """Interval-set algebra per key over two half-open interval sets:
    how much time is covered by A only, by B only, and by both — the
    SLA/blackout ledger ("uptime outside maintenance windows") that
    completes [[interval_union]] (one set's coverage) and
    [[interval_join]] (pairing). Half-open ``[s, e)`` semantics: a set
    ending exactly where the other begins overlaps nowhere.

    Boundary sweep, no joins between the interval sets: every boundary
    becomes a ±1 delta on its set's counter, deltas collapse to one
    row per (key, position), running counters come from one ordered
    window per key, and each segment ``[p, next p)`` is classified by
    the counters AFTER processing position p (so same-position
    boundaries never need a tie rule). Segment lengths use the lead
    within the same window. Returns ``(*keys, only_a, only_b, both,
    total_a, total_b)``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])

    def bounds(df, tag):
        s = F.col(start_col).cast("double")
        e = F.col(end_col).cast("double")
        da = 1 if tag == "a" else 0
        db = 1 if tag == "b" else 0
        starts = df.select(
            *keys, s.alias("__p"), F.lit(da).alias("__da"),
            F.lit(db).alias("__db"),
        )
        ends = df.select(
            *keys, e.alias("__p"), F.lit(-da).alias("__da"),
            F.lit(-db).alias("__db"),
        )
        return starts.unionByName(ends)

    ev = bounds(df_a, "a").unionByName(bounds(df_b, "b"))
    per = ev.groupBy(*keys, "__p").agg(
        F.sum("__da").alias("__da"), F.sum("__db").alias("__db")
    )
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy("__p")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    staged = per.select(
        *keys,
        "__p",
        F.sum("__da").over(cum).alias("__ca"),
        F.sum("__db").over(cum).alias("__cb"),
        F.lead("__p").over(w).alias("__pn"),
    ).where(F.col("__pn").isNotNull())
    seg = F.col("__pn") - F.col("__p")
    in_a = F.col("__ca") > 0
    in_b = F.col("__cb") > 0
    g = staged.groupBy(*keys) if keys else staged.groupBy()
    return g.agg(
        F.sum(F.when(in_a & ~in_b, seg).otherwise(0.0)).alias("only_a"),
        F.sum(F.when(~in_a & in_b, seg).otherwise(0.0)).alias("only_b"),
        F.sum(F.when(in_a & in_b, seg).otherwise(0.0)).alias("both"),
        F.sum(F.when(in_a, seg).otherwise(0.0)).alias("total_a"),
        F.sum(F.when(in_b, seg).otherwise(0.0)).alias("total_b"),
    )
