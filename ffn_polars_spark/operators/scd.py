"""Slowly-changing-dimension (SCD type 2) versioning.

Beyond the reference's surface (/root/reference/ffn_polars has no
dimension-management layer): the standard warehouse pattern for tracking
attribute history — each key holds a chain of ``[valid_from, valid_to)``
versions, the open version having ``valid_to IS NULL``. A training-data
pipeline needs the same shape for slowly-changing metadata (document
licenses, source quality tiers, user consent state) so that any batch can
be joined AS OF its snapshot time.

Design notes (100 TB):

* The merge never joins updates against the dimension: open versions are
  re-cast as pseudo-updates at their ``valid_from`` and UNIONed with the
  incoming snapshots, so change detection is one per-key lag window and
  version bracketing is one per-key lead window — both partitioned on the
  dimension key (high-cardinality, even shuffle). Closed history rows pass
  through untouched with no shuffle at all.
* Attribute comparison is null-safe struct equality (``eqNullSafe``): a
  NULL attribute is a value, not a wildcard — transitioning to/from NULL
  opens a new version, NULL == NULL does not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="scd2_merge")
def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str = "ts_ns",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merge attribute snapshots into an SCD2 dimension: close the open
    version when attributes change, open a new one at the change's
    timestamp, keep closed history verbatim.

    ``dim`` carries ``(key, *attrs, valid_from, valid_to)`` with NULL
    ``valid_to`` marking open versions (pass an empty frame to build the
    dimension from scratch); ``updates`` carries ``(key, *attrs, ts)``
    snapshots. Updates are assumed to be at-or-after each key's open
    ``valid_from`` (the normal append-only feed contract), with UNIQUE
    ``(key, ts)`` — two snapshots of one key at the same instant have no
    defined order, so dedupe upstream; an unchanged snapshot produces no
    new version.

    Returns the full new dimension ``(key, *attrs, valid_from, valid_to)``.
    """
    attrs = list(attr_cols)
    closed = dim.where(F.col(to_col).isNotNull()).select(
        key_col, *attrs, from_col, to_col
    )
    open_rows = dim.where(F.col(to_col).isNull()).select(
        F.col(key_col), *[F.col(a) for a in attrs], F.col(from_col).alias("__ts")
    )
    snaps = updates.select(
        F.col(key_col), *[F.col(a) for a in attrs], F.col(ts_col).alias("__ts")
    )
    stream = open_rows.unionByName(snaps)
    sig = F.struct(*[F.col(a) for a in attrs])
    w = Window.partitionBy(key_col).orderBy("__ts")
    change = stream.withColumn("__prev", F.lag(sig).over(w)).where(
        F.col("__prev").isNull() | ~sig.eqNullSafe(F.col("__prev"))
    )
    w2 = Window.partitionBy(key_col).orderBy("__ts")
    versions = change.select(
        key_col,
        *attrs,
        F.col("__ts").alias(from_col),
        F.lead("__ts").over(w2).alias(to_col),
    )
    return closed.unionByName(versions)


@register(namespace="eod", kind="df", context="dataframe", alias="scd2_asof_join")
def scd2_asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str = "ts_ns",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time (AS OF) join: attach to each fact row the dimension
    version that was valid at the fact's timestamp —
    ``valid_from <= ts < valid_to`` (open version: ``valid_to IS NULL``).
    The reason SCD2 exists: any historical batch joins against the
    attributes as they were, not as they are.

    An equi-join on the dimension KEY with the interval test as a join
    residual — per key a fact matches at most one version, so the output
    is fact-sized. The shuffle is keyed on the high-cardinality dimension
    key (AQE-skew-safe); version chains per key are short (bounded by
    change count), so the residual scan per matched key is tiny. Facts
    with no valid version at their timestamp are kept with NULL
    attributes (left join) — silent row loss hides ingestion bugs.
    """
    d = dim.select(
        F.col(key_col).alias("__k"),
        *[F.col(c) for c in dim.columns if c not in (key_col,)],
    )
    cond = (
        (F.col("__k") == facts[key_col])
        & (d[from_col] <= facts[ts_col])
        & (d[to_col].isNull() | (facts[ts_col] < d[to_col]))
    )
    return facts.join(d, cond, "left").drop("__k")


@register(namespace="eod", kind="df", context="dataframe", alias="cdc_merge")
def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str,
    value_cols: list,
) -> DataFrame:
    """Apply a change-data-capture log (I/U/D operations) to a snapshot:
    per key, only the LAST change by ``ts_col`` wins — delete drops the
    row, insert/update replaces the value columns, untouched keys pass
    through — the merge every incremental lakehouse table runs per batch
    (Delta/Iceberg MERGE INTO semantics, expressed relationally).

    The change log collapses to one row per key FIRST (``max_by`` on the
    change timestamp — log-cardinality shuffle, the snapshot is never
    rescanned per change), then a single full-outer join applies it.
    Ties on ``ts_col`` are broken by preferring the later op row via the
    (ts, op) struct ordering — supply unique timestamps for full
    determinism. Returns the merged snapshot columns.
    """
    last = changes.groupBy(key_col).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("__op"), *[F.col(c).alias(c) for c in value_cols]),
            F.col(ts_col),
        ).alias("__ch")
    )
    j = snapshot.join(last, key_col, "full_outer")
    op = F.col("__ch.__op")
    merged_vals = [
        F.when(op.isNull(), F.col(c))
        .otherwise(F.col(f"__ch.{c}"))
        .alias(c)
        for c in value_cols
    ]
    out = j.where(op.isNull() | (op != "D")).select(
        F.col(key_col), *merged_vals
    )
    return out
