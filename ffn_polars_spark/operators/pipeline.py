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
