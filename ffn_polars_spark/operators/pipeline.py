"""Composed training-data cleaning pipeline.

The end-to-end shape a pre-training data pipeline runs over a raw corpus:
language filter → quality filter → exact dedup → keep/drop decision — here
as ONE operator whose plan is a single map-side projection (quality metrics,
language vote, and content fingerprint all computed in the same pass over
``text``) followed by a single fingerprint aggregate joined back. At 100 TB
that is one scan and one hash shuffle; composing the standalone operators
(`text_quality` + `language_id` + `dedup_exact`) naively would scan the
corpus three times and join three derived tables on doc id.

Near-dup stages (MinHash / SimHash / embedding LSH) intentionally stay
separate: they need their own shuffles anyway, so chaining them after
``clean_corpus``'s survivors loses nothing and runs them on the (much
smaller) kept set.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.operators.dedup import normalized_text
from ffn_polars_spark.operators.text import (
    language_vote,
    mean_word_length,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="clean_corpus")
def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: Sequence[str] = ("en",),
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-document keep/drop decision for corpus cleaning.

    Returns ``(id, lang_pred, quality_score, canonical_id, is_duplicate,
    keep)`` where ``keep`` = language in ``languages`` AND quality ≥
    ``min_quality`` AND the document is its group's canonical copy (min id
    per exact-content fingerprint). Every document appears in the output
    with its decision — the caller filters on ``keep`` (auditable drops).

    Plan: one projection computes all text features + the md5 fingerprint;
    the only shuffle is the fingerprint groupBy (min-id per group, joined
    back — AQE broadcasts it when the duplicate-group table is small).
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    mwl = mean_word_length(t)
    pr = punct_ratio(t)
    sr = stopword_ratio(t)
    score = (
        F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(pr <= 0.3, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(sr >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    )

    base = df.select(
        F.col(id_col),
        language_vote(t).getField("lang").alias("lang_pred"),
        F.round(score, 6).alias("quality_score"),
        F.md5(normalized_text(t)).alias("__fp"),
    )
    groups = base.groupBy("__fp").agg(F.min(id_col).alias("canonical_id"))
    out = base.join(groups, "__fp").select(
        id_col,
        "lang_pred",
        "quality_score",
        "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
    )
    lang_ok = F.col("lang_pred").isin(*[str(x) for x in languages])
    return out.withColumn(
        "keep",
        lang_ok
        & (F.col("quality_score") >= F.lit(float(min_quality)))
        & ~F.col("is_duplicate"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="deterministic_split")
def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Optional[dict] = None,
    buckets: int = 10_000,
    salt: str = "",
) -> DataFrame:
    """Stable train/val/test assignment by content-independent id hash.

    ``bucket = int(md5(str(id) || salt)[:8], 16) % buckets``; cumulative
    weight cutoffs over the bucket space pick the split. Properties a
    training pipeline needs: (1) deterministic — re-runs, engine changes,
    and partitioning changes can't move a document between splits; (2)
    incremental — new documents don't reshuffle old assignments; (3)
    engine-portable — md5-of-string is identical everywhere, so holdout
    membership can be recomputed outside Spark. ``salt`` re-rolls the
    assignment without touching the data.

    Pure map-side projection: zero shuffle at any scale.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    bucket = h % F.lit(buckets)
    expr, cum = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cut = int(round(cum * buckets))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (expr.otherwise if expr is not None else F.lit)(names[-1])
    return df.withColumn("bucket", bucket).withColumn("split", expr)


@register(namespace="eod", kind="df", context="dataframe", alias="shard_by_tokens")
def shard_by_tokens(
    df: DataFrame,
    budget: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 1 << 20,
) -> DataFrame:
    """Pack documents into token-budget shards in ``id_col`` order.

    ``shard_id = floor(exclusive_prefix_sum(tokens) / budget)`` — the
    deterministic sharding a pre-training pipeline uses to cut a corpus into
    ~equal-token output files. The prefix sum is the two-pass blocked cumsum
    (core.blocked_cumsum): rows bucket into fixed id blocks, per-block
    running sums run in parallel, and only the tiny per-block totals pass
    through a global window — an un-keyed ``sum().over(Window.orderBy)``
    would funnel the full corpus through ONE partition, the classic scale
    cliff at 100 TB.

    Returns ``(id, n_tokens, shard_id)``; exclusive prefix sum means a
    document larger than ``budget`` still lands in exactly one shard.
    """
    from ffn_polars_spark.core import blocked_cumsum

    t = df.select(
        F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tokens")
    )
    c = blocked_cumsum(t, id_col, F.col("n_tokens"), "__cum", block=block)
    return c.select(
        F.col(id_col),
        "n_tokens",
        F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(float(budget)))
        .cast("long")
        .alias("shard_id"),
    )
