"""Bootstrap resampling — operator #39 of SURVEY.md §2.9.

Parity target: /root/reference/ffn_polars/df/core.py:9-47 (i.i.d. bootstrap:
each trial draws n rows with replacement and applies a user stat function).

Two implementations:

* :func:`resample_returns` — faithful driver loop of
  ``df.sample(withReplacement=True, fraction=1.0)``; exact n-of-n semantics in
  expectation, one Spark job per trial. Right for moderate trial counts.
* :func:`bootstrap_replicate` / :func:`resample_returns_poisson` — the
  scalable single-pass variant: every (row, trial) pair gets a Poisson(1)
  replicate count (the standard distributed approximation of n-of-n
  with-replacement sampling — multinomial(n, 1/n) marginals converge to
  Poisson(1)), so ALL trials run in one job as a groupBy("trial") aggregate.
  This is the 100 TB path: one shuffle, no driver loop.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register

# Cumulative probabilities of Poisson(1): P(X <= k) for k = 0..9. The tail
# beyond 9 (~1e-7) is folded into the last bucket. Used as an inverse-CDF
# ladder over F.rand() so replication stays entirely JVM-side.
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988747974021,
    1.0,
]


@register(kind="df")
def resample_returns(
    df: DataFrame,
    func: Callable[[DataFrame], Union[float, int, Row, dict, DataFrame]],
    seed: int = 0,
    num_trials: int = 100,
) -> DataFrame:
    """Bootstrap: for each trial, sample ~n rows with replacement and apply
    ``func``; one output row per trial.

    ``func`` may return a scalar (recorded as column ``stat``), a dict /
    ``Row``, or a 1-row DataFrame (column names preserved) — the same
    result-shape normalization as the reference (df/core.py:31-45).
    """
    spark = df.sparkSession
    results: List[dict] = []
    for i in range(num_trials):
        sample = df.sample(withReplacement=True, fraction=1.0, seed=seed + i)
        result = func(sample)

        if isinstance(result, (float, int)):
            results.append({"trial": i, "stat": float(result)})
        elif isinstance(result, Row):
            results.append({"trial": i, **result.asDict()})
        elif isinstance(result, dict):
            results.append({"trial": i, **result})
        elif isinstance(result, DataFrame):
            rows = result.limit(2).collect()
            if len(rows) != 1:
                raise ValueError("func must return a DataFrame with exactly one row")
            results.append({"trial": i, **rows[0].asDict()})
        else:
            raise TypeError(f"Unsupported return type from func: {type(result)}")

    out = spark.createDataFrame(results)
    ordered = ["trial"] + [c for c in out.columns if c != "trial"]
    return out.select(*ordered)


def bootstrap_replicate(
    df: DataFrame, num_trials: int = 100, seed: int = 0, lam: float = 1.0
) -> DataFrame:
    """Replicate every row Poisson(lam) times per trial, adding a ``trial``
    column — the single-pass distributed bootstrap (SURVEY.md §2.9 option b).

    The Poisson draw is an inverse-CDF CASE ladder over ``F.rand(seed)`` —
    pure JVM, no UDF, no shuffle (the explode is pipelined into whatever
    consumes it).
    """
    if lam != 1.0:
        raise NotImplementedError("only lam=1.0 (n-of-n bootstrap) is supported")
    u = F.rand(seed)
    cnt = F.lit(len(_POISSON1_CDF) - 1)
    for k in range(len(_POISSON1_CDF) - 2, -1, -1):
        cnt = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(cnt)
    return (
        df.withColumn("trial", F.explode(F.sequence(F.lit(0), F.lit(num_trials - 1))))
        .withColumn("__reps", cnt)
        .where(F.col("__reps") > 0)
        .withColumn("__rep", F.explode(F.sequence(F.lit(1), F.col("__reps"))))
        .drop("__reps", "__rep")
    )


def resample_returns_poisson(
    df: DataFrame,
    aggs: Dict[str, Column],
    num_trials: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Scalable bootstrap: one distributed pass computing every trial's
    aggregate statistics at once.

    ``aggs`` maps output column name -> aggregate Column (evaluated per
    trial). Example::

        resample_returns_poisson(df, {"mean": F.avg("returns")}, 1000)
    """
    replicated = bootstrap_replicate(df, num_trials=num_trials, seed=seed)
    return replicated.groupBy("trial").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
