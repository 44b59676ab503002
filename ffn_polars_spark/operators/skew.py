"""Skew mitigation: salted aggregation and salted joins.

AQE handles moderate skew (``skewJoin`` splits oversized partitions at
runtime), but pathological hot keys — one ticker carrying half the tape, a
null-heavy join key — still serialize on a single reducer. These operators
implement the classic salting rewrites declaratively:

* :func:`salted_agg` — two-stage aggregation: partial aggregate on
  (keys, salt) spreads a hot key over ``buckets`` reducers, the final
  aggregate combines the (tiny) partials. Results are exactly equal to the
  direct ``groupBy`` for the supported algebraic aggregates.
* :func:`salted_join` — a skewed left (fact) side gets a random salt; the
  right (dim) side — too big to broadcast, too small to matter — is
  replicated ``buckets`` times, so each hot key's rows land on ``buckets``
  different reducers.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register

# agg name -> (partial expression builder, final combiner builder)
_ALGEBRAIC: Dict[str, Tuple] = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda p: F.sum(p).cast("long"),
    ),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
    # avg decomposes into (sum, count) partials
}


def _to_list(v) -> List[str]:
    return [v] if isinstance(v, str) else list(v)


@register(kind="df", context="dataframe")
def salted_agg(
    df: DataFrame,
    keys: Union[str, Sequence[str]],
    aggs: Dict[str, Tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """GroupBy with hot-key spreading.

    ``aggs`` maps output name -> (agg, column) with agg in
    {count, sum, min, max, avg}. Example::

        salted_agg(trades, "ticker", {"n": ("count", "*"),
                                      "vol": ("sum", "size"),
                                      "px": ("avg", "price")}, buckets=32)

    Spark's hash aggregate already does map-side partials, which usually
    makes salting unnecessary for aggregation — the rewrite matters when the
    map-side combine is defeated (high-cardinality compound keys, or an agg
    downstream of an exchange that clusters a hot key onto one task).
    """
    keys = _to_list(keys)
    salt = (F.rand() * buckets).cast("int").alias("__salt")

    partials, finals = [], []
    for name, (agg, col) in aggs.items():
        if agg == "avg":
            partials.append(F.sum(col).alias(f"__ps_{name}"))
            partials.append(F.count(col).alias(f"__pc_{name}"))
            finals.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        elif agg in _ALGEBRAIC:
            part, fin = _ALGEBRAIC[agg]
            c = F.lit(1) if col == "*" else F.col(col)
            partials.append(part(c).alias(f"__p_{name}"))
            finals.append(fin(F.col(f"__p_{name}")).alias(name))
        else:
            raise ValueError(
                f"unsupported agg '{agg}' — supported: count/sum/min/max/avg"
            )

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


@register(kind="df", context="dataframe")
def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Union[str, Sequence[str]],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    For each right row, ``buckets`` copies tagged 0..buckets-1 are emitted
    (an explode, pipelined — no driver work); each left row draws one random
    salt. A key that dominates the left side then spreads across ``buckets``
    reducers instead of hot-spotting one. Right-side size grows by
    ``buckets``x — use for mid-size dims above the broadcast threshold.
    """
    keys = _to_list(keys)
    lsalt = (F.rand() * buckets).cast("int").alias("__salt")
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l.join(r, keys + ["__salt"], how).drop("__salt")


@register(namespace="eod", kind="df", context="dataframe", alias="skew_profile")
def skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Join/aggregation skew diagnosis for a key column: the measurement
    step before [[salted_agg]] / [[salted_join]]'s mitigation. Emits one
    row per top-``top_k`` hot key with its share of all rows, plus the
    summary every row carries — distinct key count, the max single-key
    share, and the recommended salt bucket count
    ``ceil(hot_rows / mean_rows_per_key)`` (how many average-sized tasks
    the hottest key would need to split into for balance).

    One key-cardinality aggregate + a TakeOrderedAndProject-style ranked
    window limited to ``top_k`` — the full table never shuffles twice.
    Returns ``(key, n_rows, share, rank, n_keys, max_share,
    recommended_buckets)``.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__tot"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("__max"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition local
    # top-k, merged once) — the global rank window would instead sort the
    # whole key space on one task; row_number then runs on only k rows
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(
        int(top_k)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    ranked = top.withColumn("rank", F.row_number().over(w)).crossJoin(
        F.broadcast(totals)
    )
    share = F.col("n_rows").cast("double") / F.col("__tot").cast("double")
    mean_per_key = F.col("__tot").cast("double") / F.col("n_keys").cast("double")
    return ranked.select(
        "key",
        "n_rows",
        share.alias("share"),
        "rank",
        "n_keys",
        (F.col("__max").cast("double") / F.col("__tot").cast("double")).alias(
            "max_share"
        ),
        F.ceil(F.col("__max").cast("double") / mean_per_key).cast("long").alias(
            "recommended_buckets"
        ),
    )
