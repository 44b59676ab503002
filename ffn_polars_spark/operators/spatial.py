"""Spatial operators: grid-bucketed radius joins over 2-D coordinates.

Beyond the reference's surface (/root/reference/ffn_polars has no spatial
layer): proximity questions — "which points lie within r of each other?"
— are all-pairs problems that a naive crossJoin makes O(n²); the standard
distributed answer buckets space into cells of side r so every qualifying
pair shares a 3×3 cell neighborhood, turning the candidate stage into an
equi-join Spark shuffles on the cell key.

Design notes (100 TB):

* One side explodes to its 9 neighbor cells (a ×9 map-side blowup of the
  SMALLER side), the other stays on its home cell — each candidate pair
  is then generated exactly once (a pair meets only where the exploded
  cell equals the home cell), so no post-join dedup pass is needed.
* The exact distance filter runs inside the joined projection, before
  anything materializes; output cardinality is true-neighbor count, not
  candidate count.
* Distances are Euclidean on the given coordinates — ``sqrt`` is
  IEEE-correctly-rounded, so results are bit-identical across engines
  (no transcendental haversine in the exact path; for geographic data,
  project first — an equirectangular x = lon·cos(lat₀), y = lat scaled
  to km is the usual prefilter, with the great-circle refine as a
  secondary predicate if needed).
* Dense cells are the skew risk: a cell holding k points contributes k²
  candidates. The cell histogram (one cheap aggregate) is the
  diagnostic; shrinking the cell below r and widening the neighbor
  stencil trades blowup factor against per-cell fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="radius_join")
def radius_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All pairs of points within Euclidean ``radius`` of each other —
    grid-bucketed: cells of side ``radius`` guarantee every qualifying
    pair lies in adjacent cells, one side fans out to its 3×3 cell
    neighborhood (map-side ×9), the candidate stage is a plain cell
    equi-join, and the exact ``√(Δx²+Δy²) ≤ r`` filter plus an
    ``id_a < id_b`` canonicalization run inside the join projection.
    Never the crossJoin. Returns ``(id_a, id_b, distance)``.
    """
    r = float(radius)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    pts = df.select(
        F.col(id_col).alias("__id"),
        x.alias("__x"),
        y.alias("__y"),
        F.floor(x / F.lit(r)).alias("__cx"),
        F.floor(y / F.lit(r)).alias("__cy"),
    )
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    a = pts.select(
        F.col("__id").alias("id_a"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.col("__cx").alias("__cxa"),
        F.col("__cy").alias("__cya"),
        off.alias("__o"),
    ).select(
        "id_a", "__xa", "__ya",
        (F.col("__cxa") + F.col("__o.dx")).alias("__cx"),
        (F.col("__cya") + F.col("__o.dy")).alias("__cy"),
    )
    b = pts.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        "__cx",
        "__cy",
    )
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        a.join(b, ["__cx", "__cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("distance"))
        .where(F.col("distance") <= F.lit(r))
    )


@register(namespace="eod", kind="df", context="dataframe", alias="cell_stats")
def cell_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    cell: float,
) -> DataFrame:
    """Occupancy histogram of the spatial grid [[radius_join]] buckets
    into — the skew diagnostic to run BEFORE a radius join at scale: a
    cell with k points contributes k² candidate pairs, so the max and
    the tail of this histogram bound the join's worst partition. One
    projection + one aggregate. Returns ``(cell_x, cell_y, n)``.
    """
    c = float(cell)
    return df.groupBy(
        F.floor(F.col(x_col).cast("double") / F.lit(c)).alias("cell_x"),
        F.floor(F.col(y_col).cast("double") / F.lit(c)).alias("cell_y"),
    ).agg(F.count(F.lit(1)).alias("n"))
