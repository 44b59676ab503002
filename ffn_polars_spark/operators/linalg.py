"""Distributed linear algebra: principal components of an embedding column.

Beyond the reference's surface (/root/reference/ffn_polars has no
linear-algebra layer): the top principal direction of an embedding corpus
is the workhorse behind whitening, anisotropy diagnosis ("all my
embeddings point the same way" — the common failure of contrastive
encoders), and the all-but-the-top post-processing trick for retrieval.

Design notes (100 TB):

* The DISTRIBUTED step is the d×d second-moment accumulation
  ``S = Σ xxᵀ`` — one pass over n vectors; everything after runs on a
  d²-sized frame (d = embedding width, 64–4096), which is driver-scale
  by construction. This is the same big-n/small-d split as
  ``similarity.ann_topk_ivf``'s sampled k-means: Spark owns the data
  pass, the driver owns the tiny iteration.
* The power iteration is EXACT-REPLAY ARITHMETIC: inputs quantize to
  power-of-two grids (2⁻¹⁰ for matrix entries, 2⁻¹⁵ for the vector), so
  every product has ≤ 53 significant bits and every sum is exact in
  IEEE doubles — summation ORDER cannot change a bit, which is what
  lets a SQL oracle replay the recurrence aggregate-by-aggregate. The
  only non-exact steps (√, the two divisions) are correctly-rounded
  scalar ops on identical inputs. Quantization perturbs each step by
  ~2⁻¹⁵ — far below the r6 reporting precision, and power iteration is
  self-correcting toward the dominant eigenvector.
* Uncentered by default: S/n is the raw second-moment matrix, whose top
  eigenvector is what anisotropy work actually uses (the mean direction
  dominates); pass vectors through ``embedding_normalize`` or subtract
  a broadcast mean first when centered PCA is wanted.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register

# power-of-two grids: matrix entries on 2^-10, iteration vectors on 2^-15.
# The pre-normalization downscale is data-derived (m = d * max|S|, an exact
# bound on |S v| for unit v): y/m is a correctly-rounded SCALAR op on
# identical inputs, so it replays bit-for-bit even though it is not grid
# arithmetic — exactness is only required of the SUMS.
_QM = 1024.0
_QV = 32768.0


def _q(x: float, grid: float) -> float:
    return math.floor(x * grid + 0.5) / grid


@register(namespace="eod", kind="df", context="dataframe", alias="embedding_top_pc")
def embedding_top_pc(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 15,
) -> DataFrame:
    """Top principal direction of an embedding column via distributed
    second-moment accumulation + a fixed-iteration power method:
    ``S = Σ xxᵀ`` (one Spark pass, exact grid arithmetic), then
    ``v ← S·v / ‖S·v‖`` for ``iterations`` rounds on the collected
    d²-entry matrix — deterministic, engine-replayable (see module
    docstring), and convergent to the dominant eigenvector for any
    PSD ``S``. Returns ``(component, loading, eigenvalue)`` — one row
    per dimension, ``eigenvalue`` the Rayleigh estimate ``‖S·v‖``
    repeated on every row.
    """
    x = F.col("__x").cast("double")
    q = F.floor(x * F.lit(_QM) + F.lit(0.5)) / F.lit(_QM)
    a = df.select(
        F.col(id_col).alias("__id"), F.posexplode(vec_col).alias("__i", "__x")
    ).select("__id", "__i", q.alias("__q"))
    b = a.select(
        F.col("__id").alias("__id"),
        F.col("__i").alias("__j"),
        F.col("__q").alias("__qj"),
    )
    s_raw = (
        a.join(b, "__id")
        .groupBy("__i", "__j")
        .agg(F.sum(F.col("__q") * F.col("__qj")).alias("__s"))
    )
    sq = F.floor(F.col("__s") * F.lit(_QM) + F.lit(0.5)) / F.lit(_QM)
    # bounded collect: d^2 rows (64-dim -> 4096), the driver-scale frame
    rows = s_raw.select("__i", "__j", sq.alias("__s")).collect()
    d = max(r["__i"] for r in rows) + 1 if rows else 0
    if d == 0:
        return df.sparkSession.createDataFrame(
            [], "component INT, loading DOUBLE, eigenvalue DOUBLE"
        )
    S = [[0.0] * d for _ in range(d)]
    for r in rows:
        S[r["__i"]][r["__j"]] = r["__s"]
    m = float(d) * max(abs(S[i][j]) for i in range(d) for j in range(d))
    if m == 0.0:
        return df.sparkSession.createDataFrame(
            [(i, 0.0, 0.0) for i in range(d)],
            "component INT, loading DOUBLE, eigenvalue DOUBLE",
        )
    v = [_q(1.0 / math.sqrt(d), _QV) for _ in range(d)]
    lam = 0.0
    for _ in range(int(iterations)):
        # y = S v: exact sums of bounded-grid products -> order-free
        y = [sum(S[i][j] * v[j] for j in range(d)) for i in range(d)]
        t = [_q(yi / m, _QV) for yi in y]
        nrm = math.sqrt(sum(ti * ti for ti in t))
        lam = nrm * m
        if nrm == 0.0:
            v = [0.0] * d
            break
        v = [_q(ti / nrm, _QV) for ti in t]
    out = [(i, v[i], lam) for i in range(d)]
    return df.sparkSession.createDataFrame(
        out, "component INT, loading DOUBLE, eigenvalue DOUBLE"
    )


@register(namespace="eod", kind="df", context="dataframe", alias="embedding_remove_pc")
def embedding_remove_pc(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 15,
) -> DataFrame:
    """All-but-the-top embedding post-processing: subtract each vector's
    projection onto the corpus's dominant direction,
    ``x' = x − (x·v)v`` — the standard anisotropy correction (Mu &
    Viswanath's first step) that measurably improves cosine retrieval
    on encoders whose embeddings share a common component.
    [[embedding_top_pc]] supplies ``v``; this operator broadcasts it
    (d doubles) and runs ONE projection pass over the corpus — no
    second shuffle.

    Exact-replay arithmetic throughout: elements quantize to the 2⁻¹⁰
    grid and ``v`` is already on 2⁻¹⁵, so the dot product is an exact
    (order-free) sum; the final ``q − (x·v)·vᵢ`` is a correctly-rounded
    scalar chain on identical inputs. Emits exploded rows ``(id,
    component, residual)`` so the result hashes engine-independently;
    ``F.array_agg`` them back when an array column is wanted.
    """
    pc = embedding_top_pc(df, vec_col, id_col, iterations).collect()
    v = [0.0] * len(pc)
    for r in pc:
        v[r["component"]] = r["loading"]
    varr = F.array(*[F.lit(x) for x in v])
    x = F.col("__x").cast("double")
    q = F.floor(x * F.lit(_QM) + F.lit(0.5)) / F.lit(_QM)
    a = df.select(
        F.col(id_col).alias("__id"), F.posexplode(vec_col).alias("__i", "__x")
    ).select("__id", "__i", q.alias("__q"))
    dot = a.select(
        "__id", (F.col("__q") * F.element_at(varr, F.col("__i") + 1)).alias("__p")
    ).groupBy("__id").agg(F.sum("__p").alias("__dp"))
    out = a.join(dot, "__id").select(
        F.col("__id"),
        F.col("__i").alias("component"),
        (
            F.col("__q")
            - F.col("__dp") * F.element_at(varr, F.col("__i") + 1)
        ).alias("residual"),
    )
    return out.withColumnRenamed("__id", id_col)
