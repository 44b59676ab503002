"""Deterministic distributed random columns for the simulator.

Spark's ``F.rand``/``F.randn`` derive their stream from the *partition index*,
so values change whenever partitioning changes and may disagree between two
plan branches that re-evaluate the same lineage. The simulator instead makes
every draw a pure function of ``(row id, stream tag, seed)`` via ``xxhash64``:
reproducible under any partitioning, safe to reference from multiple plan
branches, and seedable per day — the distributed analogue of the reference's
``np.random.seed(seed + day_index)`` convention
(/root/reference/ffn_polars/sim/quotes.py:30, trades.py:17).

All generators are closed-form column expressions (Box-Muller for normals,
inverse-CDF ladders for Poisson / weighted choice) — pure JVM, whole-stage
codegen, no UDFs.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO_63 = float(2**63)
_TWO_PI = 2.0 * math.pi


def uniform(id_col: Column, tag: str, seed: int, hash_fn: str = "xxhash64") -> Column:
    """U[0, 1) as a pure function of (id, tag, seed).

    ``hash_fn``:

    * ``"xxhash64"`` (default) — Spark's JVM-native seeded hash; fastest,
      but only another Spark run can reproduce the stream.
    * ``"md5"`` — engine-portable: the low 15 hex chars of
      ``md5(id:tag:seed)`` as a 60-bit integer scaled to [0, 1).  DuckDB
      replays it exactly as ``('0x' || substr(md5(s), 18, 15))::BIGINT /
      2^60``.  The 60-bit integer exceeds double's 53-bit mantissa, so the
      long->double cast *rounds* — but IEEE754 round-to-nearest is fully
      specified, so both engines round to the same double, and the
      subsequent division by a power of two is exact; the uniforms are
      therefore bit-identical across engines.  This is what lets the
      correctness oracle replay a whole simulated session.
    """
    if hash_fn == "md5":
        s = F.concat_ws(
            ":", id_col.cast("string"), F.lit(tag), F.lit(str(int(seed)))
        )
        h = F.conv(F.substring(F.md5(s), 18, 15), 16, 10).cast("long")
        return h.cast("double") / F.lit(float(1 << 60))
    h = F.xxhash64(id_col, F.lit(tag), F.lit(int(seed)))
    # long -> [0, 1): shift the signed range up by 2^63 then scale.
    return (h.cast("double") / F.lit(_TWO_63)) * 0.5 + 0.5


def normal(
    id_col: Column,
    tag: str,
    seed: int,
    mean: float = 0.0,
    sd=1.0,
    hash_fn: str = "xxhash64",
) -> Column:
    """N(mean, sd) via Box-Muller on two independent uniform streams.

    ``sd`` may be a Column for heteroskedastic draws (burst-dependent
    volatility)."""
    u1 = F.greatest(uniform(id_col, tag + ".u1", seed, hash_fn), F.lit(1e-15))
    u2 = uniform(id_col, tag + ".u2", seed, hash_fn)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(_TWO_PI) * u2)
    sd_col = sd if isinstance(sd, Column) else F.lit(float(sd))
    return z * sd_col + F.lit(float(mean))


def _ladder(u: Column, cdf: Sequence[float], values: Sequence) -> Column:
    """Inverse-CDF lookup: smallest k with u < cdf[k]."""
    out = F.lit(values[-1])
    for k in range(len(cdf) - 2, -1, -1):
        out = F.when(u < F.lit(float(cdf[k])), F.lit(values[k])).otherwise(out)
    return out


def poisson_cdf(lam: float, max_k: int = 16) -> list:
    """The exact CDF literals the Poisson ladder compares against — exposed
    so the SQL oracle can embed the identical Python floats."""
    cdf, acc = [], 0.0
    for k in range(max_k):
        acc += math.exp(-lam) * lam**k / math.factorial(k)
        cdf.append(min(acc, 1.0))
    cdf[-1] = 1.0
    return cdf


def poisson(
    id_col: Column,
    tag: str,
    seed: int,
    lam: float,
    max_k: int = 16,
    hash_fn: str = "xxhash64",
) -> Column:
    """Poisson(lam) via an inverse-CDF CASE ladder (tail folded into max_k)."""
    cdf = poisson_cdf(lam, max_k)
    return _ladder(
        uniform(id_col, tag, seed, hash_fn), cdf, list(range(max_k))
    ).cast("int")


def choice_cdf(weights: Sequence[float]) -> list:
    """Cumulative weights as the ladder compares them (same accumulation
    order) — exposed for the SQL oracle."""
    cdf, acc = [], 0.0
    for w in weights:
        acc += w
        cdf.append(acc)
    cdf[-1] = max(cdf[-1], 1.0)
    return cdf


def weighted_choice(
    id_col: Column,
    tag: str,
    seed: int,
    values: Sequence,
    weights: Sequence[float],
    hash_fn: str = "xxhash64",
) -> Column:
    """One of ``values`` with the given probabilities."""
    return _ladder(uniform(id_col, tag, seed, hash_fn), choice_cdf(weights), list(values))


def randint(
    id_col: Column, tag: str, seed: int, low: int, high: int, hash_fn: str = "xxhash64"
) -> Column:
    """Uniform integer in [low, high) — numpy ``randint`` convention."""
    u = uniform(id_col, tag, seed, hash_fn)
    return (F.lit(int(low)) + F.floor(u * F.lit(float(high - low)))).cast("long")
