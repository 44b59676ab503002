"""As-of joins (backward / forward / nearest) and linear-interpolation joins.

Spark has no native as-of join; the scalable idiom is union-tag +
last-non-null over an ordered window (SURVEY.md §2.10): rows of both sides are
unioned, partitioned by the join keys, ordered by timestamp, and each left row
picks up the most recent right-side values via ``F.last(..., ignorenulls=True)``
over a running frame. One shuffle on the keys, no driver involvement, no
row-at-a-time Python — this is the plan a sort-merge as-of would produce.

The linear-interpolation variant reproduces the reference simulator's
``np.interp`` quote lookup (/root/reference/ffn_polars/sim/trades.py:52-76):
bracketing neighbors on both sides, weighted average between them, clamped to
the boundary values outside the right table's time range.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register

_LPREF = "__asof_l_"
_RPREF = "__asof_r_"


def _normalize(cols: Union[str, Sequence[str], None]) -> List[str]:
    if cols is None:
        return []
    if isinstance(cols, str):
        return [cols]
    return list(cols)


@register(kind="df", context="dataframe")
def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    strategy: str = "backward",
    tolerance: Optional[int] = None,
    right_cols: Union[str, Sequence[str], None] = None,
    suffix: str = "",
) -> DataFrame:
    """Join each left row to the closest right row at-or-before (backward),
    at-or-after (forward), or nearest in time, per key group.

    Args:
        on: timestamp column name, present in both sides (any orderable,
            numerically subtractable type — epoch-ns LongType for tick data).
        by: equi-join key column(s).
        tolerance: max |left.on - right.on| (same units as ``on``); matches
            farther away are nulled out.
        right_cols: right-side value columns to bring over (default: all
            non-key, non-ts columns).
        suffix: appended to right value column names on clash.
    """
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(f"Unsupported strategy: {strategy}")

    by = _normalize(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    right_cols = _normalize(right_cols)

    if strategy == "nearest":
        back = asof_join(left, right, on, by, "backward", tolerance, right_cols, "__bwd")
        fwd_names = {c: f"{c}__bwd" for c in right_cols}
        fwd = asof_join(back, right, on, by, "forward", tolerance, right_cols, "__fwd")
        out = fwd
        back_ts, fwd_ts = F.col("__asof_ts__bwd"), F.col("__asof_ts__fwd")
        l_ts = F.col(on)
        use_back = F.when(
            back_ts.isNotNull()
            & (fwd_ts.isNull() | ((l_ts - back_ts) <= (fwd_ts - l_ts))),
            True,
        ).otherwise(False)
        for c in right_cols:
            out = out.withColumn(
                c + suffix,
                F.when(use_back, F.col(f"{c}__bwd")).otherwise(F.col(f"{c}__fwd")),
            )
        drop = [f"{c}__bwd" for c in right_cols] + [f"{c}__fwd" for c in right_cols]
        drop += ["__asof_ts__bwd", "__asof_ts__fwd"]
        return out.drop(*drop)

    forward = strategy == "forward"

    # Tag and union. Right rows carry only keys + ts + value columns.
    lhs = left.withColumn("__is_left", F.lit(True))
    for c in right_cols:
        lhs = lhs.withColumn(_RPREF + c, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(False).alias("__is_left"),
        *[F.col(c).alias(_RPREF + c) for c in right_cols],
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # Within each key group, order by time; at equal timestamps the right row
    # sorts first so an exact-ts match is visible to the left row (Polars
    # join_asof includes equality). Forward scans in reverse time order.
    ts_order = F.col(on).desc() if forward else F.col(on).asc()
    w = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # Carry the matched right ROW as one struct (non-null whenever a right
    # row exists), not per-column last-non-null values: the matched row's
    # value must come over even when it is NULL — a per-column
    # ignorenulls carry would silently substitute an EARLIER row's value
    # for a NULL-valued match, diverging from Polars join_asof / DuckDB
    # ASOF JOIN semantics (hypothesis-found, r11). One window expression
    # instead of N+1, too.
    row_struct = F.when(
        ~F.col("__is_left"),
        F.struct(
            F.col(on).alias("__ts"),
            *[F.col(_RPREF + c).alias(c) for c in right_cols],
        ),
    )
    out = unioned.withColumn(
        "__asof_row", F.last(row_struct, ignorenulls=True).over(w)
    )
    out = out.withColumn("__asof_ts" + suffix, F.col("__asof_row.__ts"))
    for c in right_cols:
        out = out.withColumn(_RPREF + c, F.col(f"__asof_row.{c}"))
    out = out.where(F.col("__is_left")).drop("__is_left", "__asof_row")

    within = (
        F.lit(True)
        if tolerance is None
        else (F.abs(F.col(on) - F.col("__asof_ts" + suffix)) <= F.lit(tolerance))
    )
    for c in right_cols:
        target = c + suffix if (c in left.columns or suffix) else c
        out = out.withColumn(
            target,
            F.when(
                F.col("__asof_ts" + suffix).isNotNull() & within, F.col(_RPREF + c)
            ),
        ).drop(_RPREF + c)
    if suffix != "__bwd" and suffix != "__fwd":
        out = out.drop("__asof_ts" + suffix)
    return out


def interp_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    value_cols: Union[str, Sequence[str]],
    by: Union[str, Sequence[str], None] = None,
    suffix: str = "",
) -> DataFrame:
    """Linear interpolation of right-side value columns at each left
    timestamp — ``np.interp`` semantics (clamped to boundary values outside
    the right table's range). Reproduces the reference simulator's quote
    lookup (sim/trades.py:52-76) as one windowed pass per direction.

    Brackets are matched by ROW, values verbatim: each direction carries
    the nearest right row as one struct (``last(struct, ignorenulls)``)
    so a NULL-valued bracket endpoint comes over as NULL (the whole
    interpolation is then NULL, exactly as the engine-replayable ASOF
    twin computes it) — never an earlier row's value substituted at the
    wrong timestamp, which is what the previous per-column
    ``last(value, ignorenulls)`` carry did (the same defect class as the
    r11 asof_join fix, hypothesis-found in r12).
    """
    by = _normalize(by)
    value_cols = _normalize(value_cols)

    lhs = left.withColumn("__is_left", F.lit(True))
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(False).alias("__is_left"),
        *[F.col(c).alias(_RPREF + c) for c in value_cols],
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    wb = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(F.col(on).desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    row_struct = F.when(
        ~F.col("__is_left"),
        F.struct(
            F.col(on).alias("__ts"),
            *[F.col(_RPREF + c).alias(c) for c in value_cols],
        ),
    )
    out = unioned.withColumn("__b", F.last(row_struct, ignorenulls=True).over(wb))
    out = out.withColumn("__f", F.last(row_struct, ignorenulls=True).over(wf))

    out = out.where(F.col("__is_left")).drop("__is_left")

    t = F.col(on)
    t0, t1 = F.col("__b.__ts"), F.col("__f.__ts")
    frac = (t.cast("double") - t0.cast("double")) / (
        t1.cast("double") - t0.cast("double")
    )
    for c in value_cols:
        v0, v1 = F.col("__b." + c), F.col("__f." + c)
        interp = (
            F.when(t0.isNull(), v1)  # before first right row -> clamp left edge
            .when(t1.isNull(), v0)  # after last right row -> clamp right edge
            .when(t1 == t0, v0)  # exact hit / duplicate ts
            .otherwise(v0.cast("double") + (v1.cast("double") - v0.cast("double")) * frac)
        )
        out = out.withColumn(c + suffix, interp)
    return out.drop("__b", "__f")


@register(namespace="eod", kind="df", context="dataframe", alias="grid_snap")
def grid_snap(
    df: DataFrame,
    ts_col: str,
    value_cols: Union[str, Sequence[str]],
    step: int,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Resample an irregular series onto a regular ``step``-spaced grid by
    last-observation-carried-forward — the alignment step before any
    cross-series math on tick data (two tickers only have comparable rows
    once they share a clock). Grid points are the multiples of ``step``
    inside each key's own ``[min ts, max ts]`` span (integer arithmetic —
    no float boundary drift).

    Same union-tag + ``last(ignorenulls)`` window as :func:`asof_join`:
    grid rows carry null values, the union sorts once per key (ties put
    the real tick BEFORE the grid point at the same timestamp, so an
    exactly-aligned observation is picked up, not skipped), one forward
    scan fills — never a per-grid-point join. Returns
    ``(*by, grid_ts, *value_cols)``.
    """
    keys = _normalize(by)
    vals = _normalize(value_cols)
    step = int(step)
    span = df.groupBy(*keys).agg(
        F.min(F.col(ts_col)).alias("__lo"), F.max(F.col(ts_col)).alias("__hi")
    )
    # ceil/floor to step multiples in pure long arithmetic — epoch-ns
    # exceeds double's mantissa, so no float division. pmod-based rather
    # than `div`-based: `div` truncates toward zero, so for NEGATIVE
    # timestamps the old ((lo + step - 1) div step) * step ceil emitted
    # grid points outside the key's span (lo=hi=-4, step=2 gave -2) and
    # missed in-span multiples; pmod(x, step) is non-negative for
    # positive step, making lo + pmod(-lo, step) the true smallest
    # multiple >= lo and hi - pmod(hi, step) the true largest multiple
    # <= hi for any sign (property-tested over negative tapes). A key
    # whose span straddles NO step multiple (ceil > floor, e.g. ts 1..1
    # at step 2) gets no grid rows — Spark's sequence() raises on a
    # descending range with a positive step, so the filter must come
    # first (hypothesis-found, r12).
    span = span.withColumn(
        "__g0", F.expr(f"__lo + pmod(-__lo, {step})")
    ).withColumn("__g1", F.expr(f"__hi - pmod(__hi, {step})"))
    grid = span.where(F.col("__g0") <= F.col("__g1")).select(
        *keys,
        F.explode(
            F.sequence(F.col("__g0"), F.col("__g1"), F.lit(step))
        ).alias("__ts"),
        F.lit(1).alias("__is_grid"),
    )
    ticks_side = df.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_grid"),
        *[F.col(c) for c in vals],
    )
    unioned = grid.select(
        *keys, "__ts", "__is_grid", *[F.lit(None).cast("double").alias(c) for c in vals]
    ).unionByName(ticks_side)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "__ts",
        "__is_grid",
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in vals],
    )
    return filled.where(F.col("__is_grid") == 1).select(
        *keys, F.col("__ts").alias("grid_ts"), *vals
    )
