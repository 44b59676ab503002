"""EOD risk operators — #16-19 of SURVEY.md §2.3.

Parity targets: /root/reference/ffn_polars/expr/eod/risk.py. The running-max
(high-water-mark) pieces are ROWS-frame window aggregates; the scalar forms
(ulcer index, max drawdown, UPI) are two-phase — window for the cumulative
part, then a groupBy aggregate on the same keys, which Catalyst plans as a
single shuffle (the exchange introduced for the window already satisfies the
aggregate's distribution requirement).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ffn_polars_spark.core import ColumnOrName, Over, safe_div, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="eod", context="series")
@auto_alias("drawdowns")
@guard_input("self", expected_dtype="double")
def to_drawdown_series(self: ColumnOrName, *, over: Over) -> Column:
    """Drawdown series: forward-fill price gaps, then ``p / cummax(p) - 1``.

    0 at all-time highs, negative below the high-water mark. Reference:
    risk.py:61-84 (forward_fill + cum_max).
    """
    w = over.w_cum("to_drawdown_series")
    filled = F.last(self, ignorenulls=True).over(w)
    hwm = F.max(filled).over(w)
    return safe_div(filled, hwm) - 1


def drawdown_pct_series(price: ColumnOrName, *, over: Over) -> Column:
    """Ulcer building block: ``(p - cummax(p)) / cummax(p) * 100`` (no ffill —
    the reference's ulcer path uses raw prices, risk.py:22-24)."""
    w = over.w_cum("ulcer_index")
    p = to_col(price)
    hwm = F.max(p).over(w)
    return safe_div(p - hwm, hwm) * 100


def ulcer_index_agg(dd_pct: ColumnOrName) -> Column:
    """Aggregate half of the ulcer index: ``sqrt(mean(dd_pct^2))``."""
    return F.sqrt(F.avg(F.pow(to_col(dd_pct), F.lit(2))))


def max_drawdown_agg(dd: ColumnOrName) -> Column:
    """Aggregate half of max drawdown: ``min(drawdown_series)`` (risk.py:95)."""
    return F.min(to_col(dd))


@register(namespace="eod", context="dataframe")
def calc_max_drawdown(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Max drawdown per group: ``min(p/cummax(p) - 1)``. Reference: risk.py:87-95."""
    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    pre = df.withColumn("__dd", to_drawdown_series(price, over=over))
    out = f"{price}_max_drawdown"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(max_drawdown_agg("__dd").alias(out))


calc_max_drawdown._alias_suffix = "max_drawdown"


@register(namespace="eod", context="dataframe")
def ulcer_index(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Ulcer index per group: ``sqrt(mean(((p - cummax)/cummax * 100)^2))``.

    Reference: risk.py:10-26.
    """
    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    pre = df.withColumn("__ddpct", drawdown_pct_series(price, over=over))
    out = f"{price}_ulcer_index"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(ulcer_index_agg("__ddpct").alias(out))


ulcer_index._alias_suffix = "ulcer_index"


@register(namespace="eod", context="dataframe")
def ulcer_performance_index(
    df: DataFrame,
    price: str,
    rf: Union[float, str] = 0.0,
    n: Optional[int] = None,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Ulcer Performance Index: ``mean(excess returns) / ulcer_index(price)``.

    float rf: per-period ``rf/n`` subtracted (requires n when rf != 0 —
    ValueError, risk.py:47-48); str rf: a returns column subtracted; anything
    else TypeError. Reference: risk.py:29-58.
    """
    from ffn_polars_spark.functions.eod_returns import to_returns

    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    rets = to_returns(price, over=over)

    if isinstance(rf, float):
        if rf != 0 and n is None:
            raise ValueError("nperiods must be set when rf is a non-zero float")
        excess = rets - F.lit(rf / n if rf != 0 else 0.0)
    elif isinstance(rf, str):
        excess = rets - F.col(rf)
    else:
        raise TypeError("rf must be a float or a string (column name)")

    pre = df.withColumn("__excess", excess).withColumn(
        "__ddpct", drawdown_pct_series(price, over=over)
    )
    out = f"{price}_ulcer_performance_index"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(safe_div(F.avg("__excess"), ulcer_index_agg("__ddpct")).alias(out))


ulcer_performance_index._alias_suffix = "ulcer_performance_index"


@register(namespace="eod", context="dataframe")
def drawdown_details(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
) -> DataFrame:
    """Per-episode drawdown table: one row per underwater stretch with its
    start, trough, end, depth, and length (the classic ffn
    ``drawdown_details`` report; the reference exposes only the series and
    scalar forms — risk.py:61-95 — this is the episode segmentation on
    top).

    An episode is a maximal run of rows below the high-water mark; at a
    peak ``p == cummax(p)`` exactly, so ``dd == 0.0`` is an exact IEEE
    comparison, not a tolerance. Segmentation = cumulative count of peak
    rows (the sessionize idiom), then one aggregate per episode; the
    trough date is the earliest date attaining the episode minimum —
    deterministic under ties. Two window passes + one aggregate, all on
    the same partitioning: one shuffle per key.

    Returns ``(*by, episode, start_d, trough_d, end_d, depth, n_obs)``
    with episodes numbered 1.. per group in time order. Open episodes
    (still underwater at series end) report the last observation as
    ``end_d``.
    """
    by = list(by or [])
    over = Over(order_by=order_by, partition_by=by or None)
    pre = df.withColumn("__dd", to_drawdown_series(price, over=over))
    w_cum = over.w_cum("drawdown_details")
    seg = pre.withColumn(
        "__g", F.sum((F.col("__dd") == 0).cast("long")).over(w_cum)
    ).where(F.col("__dd") < 0)
    w_g = Window.partitionBy(*[F.col(c) for c in by], F.col("__g"))
    seg = seg.withColumn("__min_dd", F.min("__dd").over(w_g))
    o = to_col(order_by)
    agg = seg.groupBy(*by, "__g").agg(
        F.min(o).alias("start_d"),
        F.min(F.when(F.col("__dd") == F.col("__min_dd"), o)).alias("trough_d"),
        F.max(o).alias("end_d"),
        F.round(F.min("__dd"), 6).alias("depth"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w_num = Window.partitionBy(*[F.col(c) for c in by]).orderBy("start_d")
    return agg.withColumn(
        "episode", F.row_number().over(w_num).cast("int")
    ).drop("__g").select(*by, "episode", "start_d", "trough_d", "end_d", "depth", "n_obs")


@register(namespace="eod", kind="df", context="dataframe", alias="calc_var_cvar")
def calc_var_cvar(
    df: DataFrame,
    returns_col: str,
    group_by: Optional[Union[str, list]] = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Historical Value-at-Risk and Conditional VaR (expected shortfall)
    per group: ``VaR = quantile(returns, alpha)`` (the SQL-standard
    interpolated quantile) and ``CVaR = mean(returns | returns <= VaR)``
    — the tail-risk pair regulators ask for and the reference's risk
    suite stops short of (/root/reference/ffn_polars/expr/eod/risk.py
    has drawdown/ulcer only).

    One exact-percentile aggregate broadcast-joined back (the return
    series never shuffles for the join), then a conditional aggregate —
    the robust_outliers shape. Both numbers are negative for loss tails;
    ``n_tail`` counts the averaged observations so a thin tail is visible
    rather than silently noisy.

    Returns ``(*group_by, n, var, cvar, n_tail)``.
    """
    gcols = (
        [group_by] if isinstance(group_by, str) else list(group_by or [])
    )
    r = F.col(returns_col)
    grp = df.groupBy(*gcols) if gcols else df.groupBy()
    q = grp.agg(F.percentile(r, F.lit(float(alpha))).alias("__var"))
    j = (
        df.join(F.broadcast(q), gcols)
        if gcols
        else df.crossJoin(F.broadcast(q))
    )
    tail = F.when(r <= F.col("__var"), r)
    out = (j.groupBy(*gcols) if gcols else j.groupBy()).agg(
        F.count(r).alias("n"),
        F.round(F.max("__var"), 6).alias("var"),
        F.round(F.avg(tail), 6).alias("cvar"),
        F.count(tail).alias("n_tail"),
    )
    return out


@register(namespace="eod", kind="df", context="dataframe", alias="return_stats")
def return_stats(df: DataFrame, return_col: str, by=None) -> DataFrame:
    """One-pass distribution panel for a return series: count, mean,
    volatility, skewness, excess kurtosis, best/worst period, and win
    rate — the summary block a performance report opens with.

    Skew/kurtosis use explicit POPULATION central moments derived from
    raw power sums (``m2 = E2 − E1²`` etc.), not engine builtins, so the
    numbers are formula-pinned and engine-replayable (builtin
    ``skewness``/``kurtosis`` differ in bias correction across engines).
    NULL skew/kurt for zero-variance series. ``win_rate`` is the positive
    share of non-null periods. Everything reduces in ONE hash aggregate —
    no window, no join, map-side partials.

    Returns ``(keys, n, mean, vol, skew, kurt_excess, best, worst,
    win_rate)``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    r = F.col(return_col).cast("double")
    e1, e2 = F.avg(r), F.avg(r * r)
    e3, e4 = F.avg(r * r * r), F.avg(r * r * r * r)
    m2 = e2 - e1 * e1
    m3 = e3 - F.lit(3.0) * e1 * e2 + F.lit(2.0) * e1 * e1 * e1
    m4 = (
        e4
        - F.lit(4.0) * e1 * e3
        + F.lit(6.0) * e1 * e1 * e2
        - F.lit(3.0) * e1 * e1 * e1 * e1
    )
    n = F.count(r)
    g = df.groupBy(*keys) if keys else df.groupBy()
    return g.agg(
        n.alias("n"),
        e1.alias("mean"),
        F.stddev_samp(r).alias("vol"),
        F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5))).alias("skew"),
        F.when(m2 > 0, m4 / (m2 * m2) - F.lit(3.0)).alias("kurt_excess"),
        F.max(r).alias("best"),
        F.min(r).alias("worst"),
        (
            F.count(F.when(r > 0, 1)).cast("double") / n.cast("double")
        ).alias("win_rate"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="streak_stats")
def streak_stats(
    df: DataFrame,
    return_col: str,
    order_by,
    by=None,
) -> DataFrame:
    """Longest winning and losing streaks of a return series — the
    gaps-and-islands pattern: sign each period (+1 win / −1 loss / 0
    flat-or-null), start a new run whenever the sign changes (lag
    compare + cumulative sum of boundaries), measure runs, keep the
    per-key maxima.

    Two ordered windows over one partitioning (the lag and the boundary
    cumsum share the sort) + a (key, run) aggregate + a tiny per-key
    aggregate — shuffle volume after the run aggregate is bounded by run
    count. Returns ``(keys, max_win_streak, max_loss_streak, n_runs)``.
    """
    from pyspark.sql.window import Window

    keys = [by] if isinstance(by, str) else list(by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    r = F.col(return_col).cast("double")
    sign = F.when(r > 0, 1).when(r < 0, -1).otherwise(0)
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        if keys
        else Window.orderBy(*order)
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    pre = df.withColumn("__sgn", sign)
    prev = F.lag("__sgn").over(w)
    boundary = F.when(
        prev.isNull() | (F.col("__sgn") != prev), 1
    ).otherwise(0)
    runs = (
        pre.withColumn("__run", F.sum(boundary).over(wc))
        .groupBy(*(keys + ["__run"]))
        .agg(F.first("__sgn").alias("__sgn"), F.count(F.lit(1)).alias("__len"))
    )
    g = runs.groupBy(*keys) if keys else runs.groupBy()
    return g.agg(
        F.max(F.when(F.col("__sgn") == 1, F.col("__len"))).alias(
            "max_win_streak"
        ),
        F.max(F.when(F.col("__sgn") == -1, F.col("__len"))).alias(
            "max_loss_streak"
        ),
        F.count(F.lit(1)).alias("n_runs"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="variance_ratio")
def variance_ratio(
    df: DataFrame,
    return_col: str,
    order_by,
    by=None,
    qs=(2, 4, 8),
) -> DataFrame:
    """Lo-MacKinlay variance-ratio profile: for each horizon ``q``,
    ``VR(q) = Var(r_q) / (q · Var(r_1))`` with overlapping ``q``-period
    sums — the classic random-walk diagnostic (VR ≈ 1 under iid returns;
    < 1 mean reversion, > 1 momentum/trending; VR(q) ~ q^{2H−2} links it
    to the Hurst exponent). Complements [[autocorr]]: the VR profile
    aggregates the whole autocorrelation structure up to ``q``.

    All horizons share ONE sorted window pass (a running sum per ``q``
    over the same ordering), the ``(q, r_q)`` pairs explode in-row, and
    one ``(key, q)`` aggregate computes both variances — incomplete
    leading windows are NULLed out by the row-count guard rather than
    silently shortened. Returns ``(keys, q, vr, n_obs)``.
    """
    from pyspark.sql.window import Window

    keys = [by] if isinstance(by, str) else list(by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    r = F.col(return_col).cast("double")
    base = (
        Window.partitionBy(*keys).orderBy(*order)
        if keys
        else Window.orderBy(*order)
    )
    # window sums must materialize in their own projection before they can
    # feed a generator; the explode's array is then plain column refs
    ocols = [c for c in order if isinstance(c, str) and c not in keys]
    staged = df.select(*keys, *ocols, r.alias("__r1"))
    cols = []
    for q in qs:
        wq = base.rowsBetween(-(int(q) - 1), 0)
        rq = F.when(
            F.count("__r1").over(wq) == int(q), F.sum("__r1").over(wq)
        )
        staged = staged.withColumn(f"__rq{q}", rq)
        cols.append(
            F.struct(
                F.lit(int(q)).alias("q"), F.col(f"__rq{q}").alias("rq")
            )
        )
    pre = staged.select(
        *keys, "__r1", F.explode(F.array(*cols)).alias("__s")
    )
    g = pre.groupBy(*(keys + [F.col("__s.q").alias("q")]))
    v1 = F.var_samp("__r1")
    vq = F.var_samp("__s.rq")
    return g.agg(
        F.when(v1 > 0, vq / (F.col("q").cast("double") * v1)).alias("vr"),
        F.count("__s.rq").alias("n_obs"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="hurst_exponent")
def hurst_exponent(
    df: DataFrame,
    return_col: str,
    order_by,
    by=None,
    qs=(2, 4, 8, 16),
) -> DataFrame:
    """Hurst exponent via the aggregated-variance method: overlapping
    ``q``-period sums satisfy ``Var(r_q) ∝ q^{2H}`` for a self-similar
    process, so the least-squares slope of ``ln Var(r_q)`` on ``ln q``
    (including ``q = 1``) halves to ``H`` — 0.5 for a random walk, > 0.5
    persistent/trending, < 0.5 anti-persistent. The long-horizon limit of
    the [[variance_ratio]] profile (``VR(q) ~ q^{2H-2}``) condensed into a
    single exponent.

    Same distributed shape as :func:`variance_ratio`: ONE sorted window
    pass stages every horizon's running sum, the ``(q, r_q)`` pairs
    explode in-row, a ``(key, q)`` aggregate reduces each horizon to its
    variance (a handful of rows per key), and a final per-key regression
    over those points is closed-form — no iteration, no join.
    Zero-variance horizons are dropped; fewer than two surviving points
    yields a NULL ``hurst``. Returns ``(keys, hurst, n_qs, n_obs)``.
    """
    from pyspark.sql.window import Window

    keys = [by] if isinstance(by, str) else list(by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    r = F.col(return_col).cast("double")
    base = (
        Window.partitionBy(*keys).orderBy(*order)
        if keys
        else Window.orderBy(*order)
    )
    ocols = [c for c in order if isinstance(c, str) and c not in keys]
    staged = df.select(*keys, *ocols, r.alias("__r1"))
    cols = [F.struct(F.lit(1).alias("q"), F.col("__r1").alias("rq"))]
    for q in qs:
        wq = base.rowsBetween(-(int(q) - 1), 0)
        rq = F.when(
            F.count("__r1").over(wq) == int(q), F.sum("__r1").over(wq)
        )
        staged = staged.withColumn(f"__rq{q}", rq)
        cols.append(
            F.struct(
                F.lit(int(q)).alias("q"), F.col(f"__rq{q}").alias("rq")
            )
        )
    pre = staged.select(*keys, F.explode(F.array(*cols)).alias("__s"))
    per_q = (
        pre.groupBy(*(keys + [F.col("__s.q").alias("q")]))
        .agg(
            F.var_samp("__s.rq").alias("__vq"),
            F.count("__s.rq").alias("__n"),
        )
        .where(F.col("__vq") > 0)
    )
    x = F.log(F.col("q").cast("double"))
    y = F.log("__vq")
    g = per_q.groupBy(*keys) if keys else per_q.groupBy()
    return g.agg(
        F.when(
            F.var_samp(x) > 0, F.covar_samp(x, y) / F.var_samp(x) / F.lit(2.0)
        ).alias("hurst"),
        F.count("q").alias("n_qs"),
        F.max(F.when(F.col("q") == 1, F.col("__n"))).alias("n_obs"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="drawdown_at_risk")
def drawdown_at_risk(
    df: DataFrame,
    price: str,
    *,
    order_by: ColumnOrName,
    by: Optional[list] = None,
    alpha: float = 0.9,
) -> DataFrame:
    """Drawdown-at-Risk and Conditional Expected Drawdown (the
    Goldberg-Mahmoud drawdown analogue of VaR/CVaR): over the per-episode
    maximum-drawdown distribution from [[drawdown_details]],
    ``dar = quantile(depth, 1−α)`` (depths are negative, so the 1−α
    quantile IS the bad tail) and ``ced = mean(depth | depth ≤ dar)`` —
    the average of the worst ``(1−α)``-fraction of drawdown episodes.
    Where [[calc_max_drawdown]] reports the single worst path,
    DaR/CED say how bad a *typical* bad episode is.

    Episode segmentation is the one-shuffle-per-key
    [[drawdown_details]] plan; the tail aggregate runs over episode rows
    (a handful per key), broadcast-joined back exactly like
    [[calc_var_cvar]]. Returns
    ``(*by, n_episodes, worst, dar, ced, n_tail)``.
    """
    by = list(by or [])
    ep = drawdown_details(df, price, order_by=order_by, by=by)
    d = F.col("depth")
    grp = ep.groupBy(*by) if by else ep.groupBy()
    q = grp.agg(
        F.percentile(d, F.lit(1.0 - float(alpha))).alias("__dar")
    )
    j = (
        ep.join(F.broadcast(q), by)
        if by
        else ep.crossJoin(F.broadcast(q))
    )
    tail = F.when(d <= F.col("__dar"), d)
    out = (j.groupBy(*by) if by else j.groupBy()).agg(
        F.count(d).alias("n_episodes"),
        F.min(d).alias("worst"),
        F.max("__dar").alias("dar"),
        F.avg(tail).alias("ced"),
        F.count(tail).alias("n_tail"),
    )
    return out
