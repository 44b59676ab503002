"""EOD ratio operators — #10-15 of SURVEY.md §2.2.

Parity targets: /root/reference/ffn_polars/expr/eod/ratios.py. All but
``calc_prob_mom`` are pure JVM-side aggregate Columns (the reference's
``map_elements`` downside clamp, flagged "TODO: vectorize" at ratios.py:29-31,
becomes a native conditional — no UDF). ``calc_prob_mom`` needs a Student-t
CDF, the one genuinely boundary-crossing computation (the reference uses a
Rust kernel, src/lib.rs:8-43); here it is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.core import ColumnOrName, Over, safe_div, to_col
from ffn_polars_spark.registry import register
from ffn_polars_spark.utils import auto_alias, guard_input


@register(namespace="eod", context="scalar")
@auto_alias("sortino_ratio")
@guard_input("self", expected_dtype="double")
def sortino_ratio(
    self: ColumnOrName, rf: float = 0.0, n: int = 252, annualize: bool = True
) -> Column:
    """Sortino ratio: ``mean(excess) / stddev_samp(downside) * sqrt(n)``.

    ``excess = r - rf/n`` (per-period rf, reference ratios.py:26-27); downside
    clamps positives to 0 but keeps nulls null (the reference's per-element
    ``min(x, 0)`` skips nulls). Null when the downside deviation is null or 0
    (ratios.py:34-38).
    """
    excess = to_col(self) - F.lit(rf / n)
    downside = F.when(excess.isNotNull(), F.least(excess, F.lit(0.0)))
    downside_std = F.stddev_samp(downside)
    sortino = F.when(
        downside_std.isNotNull() & (downside_std != 0.0),
        F.avg(excess) / downside_std,
    )
    if annualize:
        sortino = sortino * F.lit(math.sqrt(n))
    return sortino


@register(namespace="eod", context="scalar")
@auto_alias("sharpe")
@guard_input("self", expected_dtype="double")
def calc_sharpe(
    self: ColumnOrName,
    rf: Union[float, str] = 0.0,
    n: int = 252,
    annualize: bool = True,
) -> Column:
    """Sharpe ratio: ``mean(excess) / stddev_samp(excess)`` (× sqrt(n) if
    annualized). Excess returns follow #6 semantics (float rf deannualized,
    str rf a column). Reference: ratios.py:66-86. NULL on a constant
    series (zero excess-return deviation): the unguarded division threw
    an ANSI DIVIDE_BY_ZERO (r13 audit), and NULL matches both the DuckDB
    oracle's zero-div convention and sortino's documented contract.
    """
    from ffn_polars_spark.functions.eod_returns import to_excess_returns

    excess = to_excess_returns(self, rf, n)
    sd = F.stddev_samp(excess)
    sharpe = F.when(sd != 0.0, F.avg(excess) / sd)
    if annualize:
        sharpe = sharpe * F.lit(math.sqrt(n))
    return sharpe


@register(namespace="eod", context="scalar")
@auto_alias("risk_return_ratio")
@guard_input("self", expected_dtype="double")
def calc_risk_return_ratio(self: ColumnOrName) -> Column:
    """Sharpe with rf=0 (annualized at 252, the reference's defaults).

    Reference: ratios.py:89-97 — literally ``calc_sharpe(self)``.
    """
    return calc_sharpe(self)


@register(namespace="eod", context="scalar")
@auto_alias("ir")
@guard_input("self", expected_dtype="double")
@guard_input("benchmark", expected_dtype="double")
def calc_information_ratio(self: ColumnOrName, benchmark: ColumnOrName) -> Column:
    """Information ratio: ``mean(r - b) / stddev_samp(r - b)``, with NaN/null
    results coalesced to 0.0. Reference: ratios.py:100-114. A zero
    tracking-error deviation (r tracks b exactly) coalesces to 0.0 like
    every other undefined case — the unguarded division threw an ANSI
    DIVIDE_BY_ZERO there (r13 audit).
    """
    diff = to_col(self) - to_col(benchmark)
    sd = F.stddev_samp(diff)
    ir = F.when(sd != 0.0, F.avg(diff) / sd)
    return F.coalesce(F.nanvl(ir, F.lit(0.0)), F.lit(0.0))


# ---------------------------------------------------------------------------
# Probabilistic momentum — Student-t CDF of the information ratio.
# ---------------------------------------------------------------------------


def _student_t_cdf(x, df):
    """Student-t CDF via the regularized incomplete beta function.

    Pure-numpy Lentz continued-fraction evaluation of I_x(a, b) (Numerical
    Recipes §6.4 formulation), used when scipy is unavailable. Vectorized over
    x; df is scalar.
    """
    import numpy as np

    try:
        from scipy.stats import t as _t  # type: ignore

        return _t.cdf(x, df=df)
    except Exception:
        pass

    x = np.asarray(x, dtype="float64")

    def betacf(a, b, xx):
        MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
        qab, qap, qam = a + b, a + 1.0, a - 1.0
        c = np.ones_like(xx)
        d = 1.0 - qab * xx / qap
        d = np.where(np.abs(d) < FPMIN, FPMIN, d)
        d = 1.0 / d
        h = d.copy()
        for m in range(1, MAXIT + 1):
            m2 = 2 * m
            aa = m * (b - m) * xx / ((qam + m2) * (a + m2))
            d = 1.0 + aa * d
            d = np.where(np.abs(d) < FPMIN, FPMIN, d)
            c = 1.0 + aa / c
            c = np.where(np.abs(c) < FPMIN, FPMIN, c)
            d = 1.0 / d
            h = h * d * c
            aa = -(a + m) * (qab + m) * xx / ((a + m2) * (qap + m2))
            d = 1.0 + aa * d
            d = np.where(np.abs(d) < FPMIN, FPMIN, d)
            c = 1.0 + aa / c
            c = np.where(np.abs(c) < FPMIN, FPMIN, c)
            d = 1.0 / d
            delt = d * c
            h = h * delt
            if np.all(np.abs(delt - 1.0) < EPS):
                break
        return h

    def betainc(a, b, xx):
        xx = np.clip(xx, 0.0, 1.0)
        from numpy import log as _ln

        lbeta = (
            np.vectorize(math.lgamma)(a)
            + np.vectorize(math.lgamma)(b)
            - np.vectorize(math.lgamma)(a + b)
        )
        front = np.where(
            (xx > 0) & (xx < 1),
            np.exp(a * _ln(np.where(xx > 0, xx, 1)) + b * np.log1p(-np.where(xx < 1, xx, 0)) - lbeta),
            0.0,
        )
        use_direct = xx < (a + 1.0) / (a + b + 2.0)
        res = np.empty_like(xx)
        m1 = use_direct
        if np.any(m1):
            res[m1] = front[m1] * betacf(a, b, xx[m1]) / a
        m2 = ~use_direct
        if np.any(m2):
            res[m2] = 1.0 - front[m2] * betacf(b, a, 1.0 - xx[m2]) / b
        res = np.where(xx <= 0.0, 0.0, res)
        res = np.where(xx >= 1.0, 1.0, res)
        return res

    xb = df / (df + x * x)
    tail = 0.5 * betainc(df / 2.0, 0.5, xb)
    return np.where(x > 0, 1.0 - tail, tail)


def prob_mom_cdf(ir: Optional[float], n: Optional[int]) -> Optional[float]:
    """``StudentT(n-1).cdf(ir)``; None when n <= 1 or ir is None — the
    reference's null contract (src/lib.rs:26-38, ratios.py:150-157)."""
    if ir is None or n is None or n <= 1:
        return None
    v = float(_student_t_cdf(float(ir), n - 1))
    return v


@register(namespace="eod", context="dataframe")
def calc_prob_mom(
    df: DataFrame, a: str, b: str, by: Optional[list] = None
) -> DataFrame:
    """Probabilistic momentum between two return columns: the Student-t CDF
    (df = n−1) of their information ratio. Reference: ratios.py:117-147 and
    the Rust kernel src/lib.rs:8-43 (pairwise null-skipping, null when n<2 or
    the diff stddev is 0).

    Plan: IR and pair-count are computed natively in one distributed agg (one
    shuffle, partial+final); only the final scalar t-CDF crosses into Python —
    one row per group, via a vectorized pandas UDF.
    """
    from pyspark.sql.functions import pandas_udf

    by = list(by or [])
    both = F.col(a).isNotNull() & F.col(b).isNotNull()
    d = F.when(both, F.col(a) - F.col(b))
    agg = [
        (F.avg(d) / F.stddev_samp(d)).alias("__ir"),
        F.count(d).alias("__n"),
        F.stddev_samp(d).alias("__std"),
    ]
    grouped = df.groupBy(*by).agg(*agg) if by else df.groupBy().agg(*agg)

    @pandas_udf("double")
    def _tcdf(ir: pd.Series, n: pd.Series, std: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for irv, nv, stdv in zip(ir, n, std):
            if pd.isna(irv) or pd.isna(nv) or nv < 2 or pd.isna(stdv) or stdv == 0.0:
                out.append(None)
            else:
                out.append(float(_student_t_cdf(float(irv), int(nv) - 1)))
        return pd.Series(out, dtype="float64")

    out_name = f"{a}_prob_mom"
    return grouped.select(
        *[F.col(k) for k in by],
        _tcdf(F.col("__ir"), F.col("__n"), F.col("__std")).alias(out_name),
    )


calc_prob_mom._alias_suffix = "prob_mom"


@register(namespace="eod", context="dataframe")
def calc_calmar_ratio(
    df: DataFrame,
    price: str,
    date_col: str,
    by: Optional[list] = None,
    order_by: Optional[ColumnOrName] = None,
) -> DataFrame:
    """Calmar ratio: ``CAGR / |max drawdown|``. Reference: ratios.py:46-63.

    One window pass (running max for the drawdown series) + one agg on the
    same keys — a single shuffle.
    """
    from ffn_polars_spark.functions.eod_returns import calc_cagr
    from ffn_polars_spark.functions.eod_risk import to_drawdown_series

    by = list(by or [])
    over = Over(order_by=order_by or date_col, partition_by=by or None)
    pre = df.withColumn("__dd", to_drawdown_series(price, over=over))
    cagr = calc_cagr(F.col(price), F.col(date_col)).alias("__cagr")
    mdd = F.abs(F.min("__dd")).alias("__mdd")
    out = f"{price}_calmar_ratio"
    g = pre.groupBy(*by) if by else pre.groupBy()
    return g.agg(cagr, mdd).select(
        *[F.col(k) for k in by],
        safe_div(F.col("__cagr"), F.col("__mdd")).alias(out),
    )


calc_calmar_ratio._alias_suffix = "calmar_ratio"


@register(namespace="eod", context="scalar")
@auto_alias("omega")
@guard_input("self", expected_dtype="double")
def omega_ratio(self: ColumnOrName, threshold: float = 0.0) -> Column:
    """Omega ratio at ``threshold``: probability-weighted gains over
    losses, ``Σ max(r − τ, 0) / Σ max(τ − r, 0)`` — the whole-distribution
    performance measure (uses every moment, unlike Sharpe's first two).
    Ω > 1 means the gain mass above ``τ`` outweighs the loss mass below
    it. NULL when there are no sub-threshold returns (no loss mass to
    compare against). A pure aggregate: composes into any
    ``groupBy(...).agg(...)`` like [[calc_sharpe]]."""
    r = to_col(self)
    tau = F.lit(float(threshold))
    gains = F.sum(F.greatest(r - tau, F.lit(0.0)))
    losses = F.sum(F.greatest(tau - r, F.lit(0.0)))
    return F.when(losses > 0, gains / losses)


@register(namespace="eod", kind="df", context="dataframe", alias="capture_ratios")
def capture_ratios(
    df: DataFrame,
    return_col: str,
    bench_col: str,
    by=None,
) -> DataFrame:
    """Up/down capture ratios of a return series against an aligned
    benchmark: mean return in the periods the benchmark rose (fell)
    divided by the benchmark's own mean in those periods — the classic
    "do you keep up in rallies and lose less in selloffs" panel
    (up > 1 and down < 1 is the ideal quadrant). Periods where either
    side is NULL are excluded; a capture is NULL when its regime never
    occurs or the benchmark mean is zero there.

    One hash aggregate with conditional sums — no window, no join.
    Returns ``(keys, up_capture, down_capture, n_up, n_down)``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    r = F.col(return_col).cast("double")
    b = F.col(bench_col).cast("double")
    ok = r.isNotNull() & b.isNotNull()
    up, down = ok & (b > 0), ok & (b < 0)

    def regime_capture(cond):
        mr = F.avg(F.when(cond, r))
        mb = F.avg(F.when(cond, b))
        return F.when(mb != 0, mr / mb)

    g = df.groupBy(*keys) if keys else df.groupBy()
    return g.agg(
        regime_capture(up).alias("up_capture"),
        regime_capture(down).alias("down_capture"),
        F.count(F.when(up, 1)).alias("n_up"),
        F.count(F.when(down, 1)).alias("n_down"),
    )


@register(namespace="eod", context="scalar")
@auto_alias("tail_ratio")
@guard_input("self", expected_dtype="double")
def tail_ratio(
    self: ColumnOrName, upper: float = 0.95, lower: float = 0.05
) -> Column:
    """Tail ratio: ``|p95| / |p5|`` of the return distribution (exact
    linear-interpolation percentiles) — above 1 means the right tail is
    fatter than the left, the one-number asymmetry check that pairs with
    [[omega_ratio]]'s whole-distribution view. NULL when the lower-tail
    percentile is 0 (no loss tail to scale by). A pure aggregate: composes
    into any ``groupBy(...).agg(...)``."""
    r = to_col(self)
    hi = F.percentile(r, F.lit(float(upper)))
    lo = F.percentile(r, F.lit(float(lower)))
    return F.when(lo != 0.0, F.abs(hi) / F.abs(lo))


@register(namespace="eod", kind="df", context="dataframe", alias="jensen_alpha")
def jensen_alpha(
    df: DataFrame,
    return_col: str,
    bench_col: str,
    by=None,
    rf: float = 0.0,
    n: int = 252,
) -> DataFrame:
    """Full-period CAPM panel per group: OLS ``beta`` of the return series
    on an aligned benchmark (``covar_pop / var_pop``), Jensen's ``alpha``
    (annualized mean excess return not explained by beta), and the Treynor
    ratio (annualized mean excess over beta) — the single-factor
    attribution triple. Periods where either side is NULL are excluded
    from every moment, so beta and the means always cover the same sample
    (the same alignment rule as [[capture_ratios]]). ``alpha`` is NULL
    when the benchmark has zero variance; ``treynor_ratio`` additionally
    when beta is 0.

    One hash aggregate over conditional columns — no window, no join.
    Returns ``(keys, beta, alpha, treynor_ratio, n_obs)``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    per_rf = F.lit(rf / n)
    r = F.col(return_col).cast("double") - per_rf
    b = F.col(bench_col).cast("double") - per_rf
    ok = F.col(return_col).isNotNull() & F.col(bench_col).isNotNull()
    rr, bb = F.when(ok, r), F.when(ok, b)
    g = df.groupBy(*keys) if keys else df.groupBy()
    agg = g.agg(
        # NULL beta on a constant benchmark (ANSI zero-div audit, r13)
        F.when(F.var_pop(bb) > 0, F.covar_pop(rr, bb) / F.var_pop(bb)).alias(
            "__beta"
        ),
        F.avg(rr).alias("__mr"),
        F.avg(bb).alias("__mb"),
        F.count(F.when(ok, 1)).alias("n_obs"),
    )
    beta = F.col("__beta")
    alpha = (F.col("__mr") - beta * F.col("__mb")) * F.lit(float(n))
    treynor = F.when(beta != 0.0, F.col("__mr") * F.lit(float(n)) / beta)
    return agg.select(
        *keys,
        beta.alias("beta"),
        alpha.alias("alpha"),
        treynor.alias("treynor_ratio"),
        "n_obs",
    )


@register(namespace="eod", context="scalar")
@auto_alias("kelly_fraction")
@guard_input("self", expected_dtype="double")
def kelly_fraction(self: ColumnOrName, rf: float = 0.0, n: int = 252) -> Column:
    """Kelly-optimal leverage for a return series under the Gaussian
    approximation: ``f* = mean(excess) / var_samp(excess)`` — the growth-
    optimal bet size, the sizing companion to [[calc_sharpe]] (Sharpe
    ranks strategies; Kelly says how much of each to hold). NULL when the
    variance is 0. A pure aggregate: composes into any
    ``groupBy(...).agg(...)``."""
    excess = to_col(self) - F.lit(rf / n)
    var = F.var_samp(excess)
    return F.when(var > 0, F.avg(excess) / var)
