"""Survival analysis: the Kaplan–Meier product-limit estimator.

Beyond the reference's surface (/root/reference/ffn_polars ships no
survival layer): retention/churn questions over an event stream — "what
fraction of users are still active after t days?" — are survival
questions with right-censoring (a user who hasn't churned YET is
censored at the observation horizon, not a death), and the product-limit
estimator is the standard nonparametric answer.

Design notes (100 TB):

* The estimator collapses the subject-level frame to one row per
  distinct (group, event time) FIRST — ``S(t)`` only changes at event
  times, so everything after the initial aggregate runs at event-time
  cardinality, not subject cardinality.  One shuffle for the collapse,
  then per-group windows over the small frame.
* ``n_at_risk`` is derived from the same collapsed frame (group total
  minus the exclusive running count of subjects already departed) — no
  second pass over the input.
* The running product uses ``exp(Σ ln(factor))`` with an explicit
  zero-factor guard: a factor of 0 (everyone at risk dies at t) can only
  occur at a group's LAST event time, and the guard pins ``S`` to 0
  there instead of sending ``ln(0)`` into the window sum — keeping the
  whole computation engine-replayable (DuckDB raises on ``ln(0)``,
  Spark returns NULL; the guard means neither path is taken).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ffn_polars_spark.registry import register


def _keys(by: Union[str, Sequence[str], None]) -> list:
    return [by] if isinstance(by, str) else list(by or [])


@register(namespace="eod", kind="df", context="dataframe", alias="kaplan_meier")
def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Kaplan–Meier product-limit survival estimator per group:
    ``S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)`` over the distinct event times,
    where ``dᵢ`` subjects experience the event at ``tᵢ`` and ``nᵢ``
    are still at risk (duration ≥ tᵢ) — the standard right-censored
    retention/churn curve (``event_col`` = 1 observed, 0 censored;
    censored subjects leave the risk set without moving the curve).

    One subject-level aggregate to event-time cardinality, then
    per-group windows on the collapsed frame. Returns one row per
    (keys, t) at which at least one EVENT occurred: ``(keys, t,
    n_at_risk, n_events, n_censored, survival)``.
    """
    keys = _keys(by)
    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")

    per_t = df.groupBy(*keys, dur.alias("t")).agg(
        F.sum(ev).cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum(ev)).cast("long").alias("n_censored"),
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    w_ord = w_all.orderBy("t")
    departed = F.col("n_events") + F.col("n_censored")
    # exclusive running count of subjects with duration < t
    gone_before = F.coalesce(
        F.sum(departed).over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    staged = per_t.withColumn(
        "n_at_risk", F.sum(departed).over(w_all) - gone_before
    )
    factor = (
        F.lit(1.0)
        - F.col("n_events").cast("double") / F.col("n_at_risk").cast("double")
    )
    cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    # ln(0) guard: factor==0 only at a group's last event time (the risk
    # set empties); pin S to 0 there and keep ln() off the zero.
    log_sum = F.sum(F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))).over(cum)
    any_zero = F.min(factor).over(cum) <= 0
    survival = F.when(any_zero, F.lit(0.0)).otherwise(F.exp(log_sum))
    return (
        staged.withColumn("survival", survival)
        .where(F.col("n_events") > 0)
        .select(*keys, "t", "n_at_risk", "n_events", "n_censored", "survival")
    )
