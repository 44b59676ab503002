"""Deduplication operators for large-scale corpora.

Four families (BASELINE.json north star: first-class pipeline components):

* exact            — normalize → hash → hash-partitioned groupBy. One shuffle.
* n-gram Jaccard   — exact pairwise similarity via a shingle equi-join
                     (inverted index), never a cross join.
* MinHash + LSH    — shingle → K minhashes → band → bucket-join; candidate
                     pairs optionally verified with exact Jaccard. The 100 TB
                     path: cost is O(docs × shingles) + banded join, and every
                     stage is a hash shuffle on a well-distributed key.
* SimHash          — 64-bit sign-random-projection fingerprint; Hamming-ball
                     candidate retrieval via 16-bit chunk banding.

All hashing is xxhash64 (JVM-side, seeded, deterministic). No Python UDFs.
"""

from __future__ import annotations

from typing import Optional

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffn_polars_spark.registry import register


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition by ``key`` when the scan's EFFECTIVE parallelism is below
    half the cluster's slots.

    Per-document hashing is CPU-bound; a corpus whose files cannot feed
    enough tasks would otherwise pin the whole projection to that many
    cores. "Effective" is the operative word (r9): the byte-split count
    this guard once compared is a lie on single-ROW-GROUP parquet files
    (the pyarrow/pandas writer default) — a 124 MB file reports ~30 scan
    partitions while one task reads every row, because a row group is
    parquet's atomic read unit. Measured on dedup_minhash_lsh at 500k
    docs: 29 tasks at 0.7 s, one at 61 s — the whole pipeline was
    single-threaded behind a healthy-looking partition count. At real
    scale, inputs with sane row-group sizes make this a no-op.
    """
    from ffn_polars_spark.operators._scanmeta import spread_scan

    return spread_scan(df, key)


# Frames pinned by _pinned since the last release_pins() call. Operators
# return lazy DataFrames, so they cannot unpersist their own pins (the caller
# hasn't executed the plan yet); instead every pin is tracked here and the
# caller — or the next operator invocation via pinned_scope() — releases
# them once results are materialized. Without this, long sessions running
# many dedup jobs accumulate dead cache entries.
_ACTIVE_PINS: list = []


def release_pins() -> int:
    """Unpersist every frame pinned since the last release; returns the count.

    Call after materializing an operator's result (collect/write). Cache-
    backed pins (:func:`_pinned`) are safe to release early — they recompute
    from lineage. Checkpoint-backed pins (:func:`pin_checkpoint`; the frames
    returned by pagerank / connected_components) are **one-shot**: local
    checkpointing truncated their lineage, so once their blocks are freed the
    frame cannot be re-materialized — any later action on it raises. Only
    release after every consumer has collected/written what it needs."""
    n = len(_ACTIVE_PINS)
    while _ACTIVE_PINS:
        _ACTIVE_PINS.pop().unpersist()
    return n


class pinned_scope:
    """``with pinned_scope(): run_and_materialize()`` — releases every frame
    pinned inside the block on exit (pins from before the block are kept).

    Materialize results *inside* the block: a checkpoint-backed frame
    (pagerank / connected_components) that escapes the scope is unusable
    after ``__exit__`` frees its blocks (see :func:`release_pins`)."""

    def __enter__(self):
        self._mark = len(_ACTIVE_PINS)
        return self

    def __exit__(self, *exc):
        while len(_ACTIVE_PINS) > self._mark:
            _ACTIVE_PINS.pop().unpersist()
        return False


class _CheckpointPin:
    """Adapter so a ``localCheckpoint``-backed frame can ride
    ``_ACTIVE_PINS``: ``DataFrame.unpersist()`` is a CacheManager no-op for
    checkpointed frames — their data lives in a persisted RDD referenced by
    the plan's ``LogicalRDD`` node, which this releases directly.

    Releasing is **destructive**: localCheckpoint truncated the lineage, so
    after the blocks are freed the frame cannot be recomputed — a later
    action raises ``SparkException: Checkpoint block not found``. Treat the
    frame as one-shot across a :func:`release_pins` boundary."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self) -> None:
        release_checkpoint(self._df)


def release_checkpoint(df: DataFrame) -> None:
    """RDD-level unpersist of a localCheckpointed frame (see
    :class:`_CheckpointPin`). Safe on any frame — a plan without a
    LogicalRDD root is left untouched."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def pin_checkpoint(df: DataFrame) -> DataFrame:
    """Track a localCheckpointed frame for the next ``release_pins()``.

    The frame is one-shot: it is usable until the next ``release_pins()``
    and dead after (see :class:`_CheckpointPin`)."""
    _ACTIVE_PINS.append(_CheckpointPin(df))
    return df


def _pinned(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist a small derived frame that several plan branches re-read
    (signatures, shingle arrays): Spark reuses identical *exchanges* but not
    arbitrary subtrees, so self-joins and verification would otherwise
    recompute the full derivation per branch. MEMORY_AND_DISK keeps the 100 TB
    path safe (spills instead of OOM).

    Materialized eagerly by default: a lazy persist lets the two sides of a
    downstream self-join race to fill the cache — both branches then run the
    full (Arrow-kernel) derivation concurrently, which measured bimodally
    between 1x and 6x the eager wall-clock. count() costs one extra pass over
    the already-small pinned frame and makes the plan deterministic.

    ``eager=False`` is for pins whose FIRST reader is itself a single
    eagerly-materialized job (e.g. minhash's shingle arrays, read first by
    the bucket pin's own count): that one job fills the cache serially, so
    the race cannot happen and the extra count stage is pure overhead.

    Tracked in ``_ACTIVE_PINS`` for :func:`release_pins`."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        df.count()
    _ACTIVE_PINS.append(df)
    return df

def _executor_heap_bytes(spark) -> int:
    """Executor heap this session's tasks actually run under: the
    spark.executor.memory conf when set (a real cluster), else the local
    JVM's max heap (local mode, where driver == executor).

    The conf string follows Spark's ``byteStringAsMb`` grammar: an INTEGER
    with an optional one-letter (k/m/g/t/p) or two-letter (kb/mb/gb/tb/pb)
    binary suffix, and a UNIT-LESS value means MiB (``"8192"`` is 8 GiB,
    not 8192 bytes). Fractional values are rejected exactly as Spark
    rejects them (fall through to the JVM heap, never a guess).
    Mis-parsing here fails toward over-estimating the heap, which lets
    :func:`_pinned_if_fits` pin frames that GC-thrash real executors — the
    exact defect class the cap exists to prevent — so unparseable strings
    fall through to the local JVM heap rather than guessing."""
    try:
        mem = spark.conf.get("spark.executor.memory", None)
        if mem:
            import re

            m = re.fullmatch(
                r"\s*(\d+)\s*([kmgtp]b?|b)?\s*", mem.lower()
            )
            if m:
                shifts = {"b": 0, "k": 10, "m": 20, "g": 30, "t": 40, "p": 50}
                unit = m.group(2)
                # Spark reads a bare number as MiB (byteStringAsMb)
                shift = shifts[unit[0]] if unit else 20
                return int(float(m.group(1)) * (1 << shift))
    except Exception:
        pass
    try:
        return int(
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
        )
    except Exception:
        return 8 << 30


def _pinned_if_fits(df: DataFrame, est_bytes, eager: bool = True) -> DataFrame:
    """Pin unless the frame's size estimate exceeds ~30% of the executor
    heap. A cache bigger than the storage pool doesn't just evict — the
    COLUMNAR batch building during unroll GC-thrashes the heap (measured:
    the token-scale span pin at 5M docs killed an 8 GB heap even with
    longs-only columns). Past the cap, recomputing the derivation per
    consumer branch is strictly cheaper than fighting the memory manager;
    below it, the pin saves the per-branch re-derivation exactly as
    :func:`_pinned` documents. ``est_bytes=None`` (unknown) pins — the
    historical behavior. ``eager`` passes through to :func:`_pinned`."""
    if est_bytes is not None:
        cap = 0.3 * _executor_heap_bytes(df.sparkSession)
        if est_bytes > cap:
            return df
    return _pinned(df, eager=eager)


def _token_scale_est(df: DataFrame):
    """Size estimate for a token-scale derived frame (shingle rows, span
    hashes): ~3x the on-disk text bytes, the scrub_spans-measured ratio.
    None (→ pin) when the plan has no readable parquet footers."""
    from ffn_polars_spark.operators._scanmeta import scan_bytes

    b = scan_bytes(df)
    return 3 * b if b is not None else None


# Mersenne prime 2^31 - 1: (a*h + b) mod P stays within long range for
# a, b, h < P (product < 2^62) — the classic universal-hash family for
# minhash permutations.
_MERSENNE = (1 << 31) - 1

# Base 64-bit hash engines for shingle/band hashing.
#
# * "xxhash64" (default): Spark's JVM-native seeded hash — fastest, but no
#   other engine implements the same function, so results are only
#   verifiable against another Spark run.
# * "md5": engine-portable 60-bit hash — the low 15 hex chars of md5,
#   parsed as an integer. Bit-identical in any engine with md5 + hex
#   parsing (DuckDB: ``('0x' || substr(md5(s), 18, 15))::BIGINT``; Python:
#   ``int(md5(s).hexdigest()[17:32], 16)``), which is what lets the DuckDB
#   correctness oracle hash-match the full MinHash/SimHash pipelines.
#   ~2.8x slower per hash than xxhash64 (still JVM codegen, measured 0.9s
#   vs 0.3s per 5M hashes) and 60 uniform bits instead of 64 — identical
#   collision behavior for dedup purposes.


def _hash64(col: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col), 18, 15), 16, 10).cast("long")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5'; got {hash_fn!r}")


def _hash64_multi(cols: list, hash_fn: str) -> Column:
    """64-bit hash of several integer columns (band hashing)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(*cols)
    # portable: hash the '|'-joined decimal rendering (identical in SQL via
    # concat_ws / ::VARCHAR)
    return _hash64(F.concat_ws("|", *cols), "md5")


def normalized_text(text: Column) -> Column:
    """Lowercase + whitespace-collapse (the exact-dedup canonical form)."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined) from a token-array column.

    ``toks`` must be a *bound attribute* (a materialized column), not a
    composite expression: the transform lambda references it ``n+1`` times,
    and Catalyst does not common-subexpression-eliminate inside lambda
    bodies — an inline ``split()`` would re-tokenize the document per shingle
    word (quadratic in document length).
    """
    count = F.size(toks) - F.lit(n - 1)
    build = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return F.when(count > 0, build).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles straight from a text column. Prefer the two-step
    tokenize-then-shingle (see :func:`shingles_from_tokens`) in pipelines —
    this convenience form cannot materialize the token array first."""
    return shingles_from_tokens(F.split(F.trim(F.lower(text)), r"\s+"), n)


@register(namespace="eod", kind="df", context="dataframe", alias="dedup_exact")
def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate grouping: md5 of normalized text, canonical id = min id
    per hash group. Returns (id, fingerprint, canonical_id, is_duplicate).

    The min-id resolution is a WINDOW over the fingerprint partition — the
    r13 optimization-round shape. The old groupBy + join-back needed the
    (id, fingerprint) frame pinned (its two branches re-derived the
    normalize+md5 projection otherwise) and, at scale, shuffled the frame
    for the aggregate AND both join sides; the window is the same single
    hash exchange on ``fingerprint`` with no second branch, no pin, no
    join (guide §2.4 — operations keyed the same way share one exchange).
    Measured at sf0.1: 0.62 s → 0.29 s, plan 2 data exchanges + eager-pin
    count job → 1 exchange, outputs identical (the explicit
    ``fingerprint IS NOT NULL`` filter reproduces the inner join's
    null-key drop for NULL-text rows).
    """
    from pyspark.sql.window import Window

    with_fp = df.select(
        F.col(id_col),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    ).where(F.col("fingerprint").isNotNull())
    w = Window.partitionBy("fingerprint")
    return with_fp.withColumn("canonical_id", F.min(id_col).over(w)).select(
        id_col,
        "fingerprint",
        "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
    )


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, shingle) inverted-index rows, distinct per document.

    Built by exploding the per-document ``array_distinct`` shingle array —
    dedup happens in-row, so no ``distinct()`` shuffle: the only exchange in
    a consumer's plan is its own join/agg.

    The generator expression is built INSIDE the explode's own projection
    (not staged through ``_doc_shingle_arrays``): explode of an array
    column defined in a *previous* select makes GenerateExec re-evaluate
    the whole interpreted shingle build per OUTPUT row — O(tokens²) per
    document — measured 156 s vs 1.2 s on a 50k-doc corpus (the same
    per-output-row re-evaluation family as the winnow/text_quality HOF
    traps; pinned by tests/test_plans.py).
    """
    split = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.where(F.size(split) >= F.lit(n)).select(
        F.col(id_col).alias("__id"), split.alias("__toks")
    )
    return toks.select(
        "__id",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("__toks"), n))
        ).alias("__sh"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="ngram_jaccard_pairs")
def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jaccard ≥
    threshold) via an inverted shingle index: documents sharing zero shingles
    never meet, so the join output is bounded by co-occurrence, not |docs|².

    ``max_shingle_df`` drops shingles whose document frequency exceeds the
    cutoff BEFORE the self-join — the standard guard against stopword-shingle
    blowup on real corpora (a shingle in d documents contributes d²/2 join
    rows; one "of the and" shared by 10M docs is 5·10¹³ rows).  Jaccard is
    then computed over the filtered shingle space (both intersections and
    sizes exclude the dropped shingles), so results are IDENTICAL when no
    shingle exceeds the cutoff and a slight underestimate otherwise — the
    conservative direction for dedup.
    """
    # pinned: the index feeds three branches (sizes + both self-join sides);
    # without it each branch re-runs the tokenize/shingle projection
    sh = _doc_shingles(_spread(df, id_col), text_col, id_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df")).where(
            F.col("__df") > max_shingle_df
        ).select("__sh")
        # anti-join, not broadcast(hot) blindly: hot-shingle count is small by
        # construction (corpus-frequency tail), so AQE broadcasts it anyway
        sh = sh.join(hot, "__sh", "left_anti")
    # token-scale STRING shingles: heap-gate like scrub_spans' span pin
    sh = _pinned_if_fits(sh, _token_scale_est(df))
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.__sh") == F.col("b.__sh")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__sz", "__sza"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__sz", "__szb"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__inter")
                / (F.col("__sza") + F.col("__szb") - F.col("__inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


@register(namespace="eod", kind="df", context="dataframe", alias="decontaminate")
def decontaminate(
    df: DataFrame,
    holdout: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    holdout_text_col: Optional[str] = None,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with a (small) holdout/benchmark set — the standard
    test-set-leakage scrub a pre-training pipeline runs before training.

    Every training document comes back with its distinct-shingle count, the
    number of those shingles that appear anywhere in the holdout, the
    contaminated fraction, and a ``contaminated`` flag (``n_hits >=
    min_hits``) — auditable decisions, nothing silently dropped.

    Scale shape: the holdout is a benchmark (thousands of rows, not
    billions), so its distinct shingle set is broadcast — the corpus-sized
    side never shuffles for the membership probe; the only data-sized
    exchange is the per-document hit/size aggregate.  Both branches read the
    same pinned shingle frame, so tokenization runs once.
    """
    # token-scale STRING shingles: heap-gate like scrub_spans' span pin
    sh = _pinned_if_fits(
        _doc_shingles(_spread(df, id_col), text_col, id_col, n),
        _token_scale_est(df),
    )
    hold_sh = (
        _doc_shingles(holdout, holdout_text_col or text_col, id_col, n)
        .select("__sh")
        .distinct()
    )
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        sh.join(F.broadcast(hold_sh), "__sh")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(sizes, "__id", "left")
        .join(hits, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(
                    F.try_divide(F.col("n_hits"), F.col("n_shingles")), F.lit(0.0)
                ),
                6,
            ).alias("contaminated_frac"),
            (F.coalesce("n_hits", F.lit(0)) >= F.lit(int(min_hits))).alias(
                "contaminated"
            ),
        )
    )


def _tokens_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(__id, __toks) with the <n-token documents dropped — the shared front
    of every shingle pipeline. The predicate re-states the split rather than
    referencing ``__toks`` so it can run against the scan without forcing
    the token array below the spread exchange (see _doc_shingle_arrays)."""
    return df.where(
        F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")) >= F.lit(n)
    ).select(
        F.col(id_col).alias("__id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )


def _doc_shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, distinct shingle array, shingle-hash array) — pure projection.

    MinHash/SimHash are per-document computations, so the shingle set stays
    an ARRAY column inside the row instead of being exploded: no shuffle of
    shingle rows at any scale (contrast ``_doc_shingles``, whose inverted
    index is what the *exact* pairwise operator needs).

    Documents with fewer than ``n`` tokens (empty shingle set) are dropped
    HERE, by a cheap token-count predicate on the raw text. Consumers must
    NOT re-filter on ``size(__shd) > 0``: Catalyst substitutes ``__shd``'s
    defining expression into the predicate and pushes the whole interpreted
    shingle-build below the spread exchange, serializing it on the (often
    single-file) input side — measured 10s vs 0.5s at sf0.1.
    """
    toks = _tokens_frame(df, text_col, id_col, n)
    shd = toks.select(
        "__id", F.array_distinct(shingles_from_tokens(F.col("__toks"), n)).alias("__shd")
    )
    return shd.select(
        "__id",
        "__shd",
        F.transform(F.col("__shd"), lambda s: _hash64(s, hash_fn)).alias("__h64"),
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document minhash signature as ``num_hashes`` columns ``__mh{k}``.

    Base shingle hash is xxhash64 reduced mod the Mersenne prime; each
    permutation is the universal hash (a_k·h + b_k) mod P with (a_k, b_k)
    derived deterministically from ``seed``. Each signature entry is an
    ``array_min`` over the in-row hash array — the whole signature is one
    projection, zero shuffles (documents with no shingles are dropped, as
    the exploded formulation did implicitly).
    """
    arrays = _doc_shingle_arrays(df, text_col, id_col, n, hash_fn)
    return _signatures_from_arrays(arrays, _minhash_coeffs(num_hashes, seed), id_col)


def _minhash_coeffs(num_hashes: int, seed: int) -> list:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


# Signature engines. "arrow" computes the per-document permutation minima /
# bit counts in numpy over Arrow batches; "jvm" uses array higher-order
# functions. Spark evaluates HOF lambdas interpreted (outside whole-stage
# codegen), so at 128 permutations x ~50 shingles the Arrow path measures
# ~5-10x faster — this is the documented exception to the built-ins-first
# rule. Both produce bit-identical signatures (same integer arithmetic).
SIGNATURE_ENGINE = "arrow"

# Candidate-generation strategy for dedup_minhash_lsh. "self_join" is the
# pinned-bucket-table self-join; "group_pairs" is groupBy(band, bh) +
# collect_list + in-task C(k,2) pair expansion (the dedup_simhash shape).
# "auto" picks by input scale from parquet footers: the self-join's
# codegen'd hash join on a ReusedExchange wins on tiny corpora where its
# eager pin-count job is cheap (r13 paired A/Bs at 5k docs/0.6 MB: md5
# min 2.08/2.21 s vs group_pairs 2.14/2.31, both pair orderings), while
# group_pairs wins once the corpus is large enough that the extra
# construction count pass and the two-reader cache fill dominate — paired
# A/Bs, both pair orderings: at 50k docs/12 MB group_pairs 2.80/2.79 s vs
# 3.71/3.57 (xxhash64) and 3.62 vs 4.08 (md5); at 500k docs/122 MB
# 7.34/8.56 vs 9.49/9.06 — output identical pair-for-pair at every scale.
# group_pairs is also robust to contention (no two-reader lazy-pin race).
# The 4 MB cutoff sits between the measured 0.6 MB (self-join wins) and
# 12 MB (group_pairs wins) points; unknown footers (in-memory frames)
# take group_pairs — the zero-eager-job, scale-safe direction.
CANDIDATE_STRATEGY = "auto"
_GROUP_PAIRS_MIN_BYTES = 4 << 20


def _minhash_arrow(coeffs: list):
    from ffn_polars_spark.operators._arrow_kernels import make_minhash_udf

    return make_minhash_udf(coeffs)


def _md5_minhash_arrow(coeffs: list, n: int):
    from ffn_polars_spark.operators._arrow_kernels import make_md5_minhash_udf

    return make_md5_minhash_udf(coeffs, n)


def _md5_simhash_arrow(n: int):
    from ffn_polars_spark.operators._arrow_kernels import make_md5_simhash_udf

    return make_md5_simhash_udf(n)


def _signatures_from_arrays(
    arrays: DataFrame, coeffs: list, id_col: str, engine: str = None
) -> DataFrame:
    """Signature columns ``__mh{k}`` from a ``_doc_shingle_arrays`` frame."""
    engine = engine or SIGNATURE_ENGINE
    hashed = arrays.select(
        F.col("__id").alias(id_col),
        F.transform(F.col("__h64"), lambda h: F.pmod(h, F.lit(_MERSENNE))).alias("__h"),
    )

    if engine == "arrow":
        sig = _minhash_arrow(coeffs)(F.col("__h")).alias("__sig")
        return hashed.select(id_col, sig).select(
            id_col,
            *[
                F.element_at("__sig", k + 1).alias(f"__mh{k}")
                for k in range(len(coeffs))
            ],
        )

    def _perm(a: int, b: int):
        # factory, not a default-arg lambda: higher-order functions infer
        # arity from the lambda signature, so it must be exactly one arg
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))

    sigs = [
        F.array_min(F.transform(F.col("__h"), _perm(a, b))).alias(f"__mh{k}")
        for k, (a, b) in enumerate(coeffs)
    ]
    return hashed.select(id_col, *sigs)


def _bucket_pairs_streamed(grouped: DataFrame, ids_col: str, emit) -> DataFrame:
    """All C(k,2) in-bucket pairs from a sorted array column, generated
    STREAMINGLY: ``posexplode`` anchors each left element, then a per-row
    ``slice`` of the array's suffix feeds a second explode. In-row memory
    stays O(k) (the bucket array plus one suffix slice), where the r13
    ``flatten(transform(transform(...)))`` built the full k²/2 pair-struct
    array inside ONE row before exploding it — on a degenerate boilerplate
    bucket (the skew LSH produces at corpus scale) that single allocation
    hits the 2 GiB array limit / executor heap long before the pair STREAM
    itself is a problem. The emitted pair sequence is identical (i < j in
    array order); only the materialization granularity changes.

    ``emit(a, b)`` maps the left/right array elements to output columns.
    """
    lefts = grouped.select(
        F.col(ids_col), F.posexplode(F.col(ids_col)).alias("__i", "__a")
    )
    pairs = lefts.select(
        F.col("__a"),
        F.explode(
            F.slice(F.col(ids_col), F.col("__i") + F.lit(2), F.size(F.col(ids_col)))
        ).alias("__b"),
    )
    return pairs.select(*emit(F.col("__a"), F.col("__b")))


@register(namespace="eod", kind="df", context="dataframe", alias="dedup_minhash_lsh")
def dedup_minhash_lsh(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    verify="exact",
    hash_fn: str = "xxhash64",
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs.

    Signature → ``bands`` band-hashes (rows = num_hashes/bands) → bucket join
    on (band_id, band_hash) → distinct candidate pairs → (optionally) exact
    Jaccard verification on candidates only. Defaults are 64/16 (r=4, S-curve
    midpoint ≈ 0.50): half the signature compute of 128/32 at the same band
    width, with near-identical recall above ~0.7 similarity (the dedup
    regime); pass 128/32 when hunting pairs near 0.4.

    ``max_bucket`` (default None = uncapped, bit-identical to the oracle
    twin) drops band buckets holding more than that many docs before the
    self-join — the same hot-key valve as winnow's ``max_fp_df``. A
    DEGENERATE bucket (e.g. a boilerplate/empty-text signature shared by
    k docs) emits C(k,2) pairs: at 100 TB one million-doc bucket is 5×10¹¹
    candidates from a single key, all landing on one join task. Docs in a
    dropped bucket can still pair through their other ``bands − 1``
    buckets, so for true near-dups (most bands collide) the recall cost is
    ~0; set it around 10³–10⁴ when running web-scale corpora with
    boilerplate. Exact-duplicate GROUPS larger than the cap should be
    collapsed by [[dedup_exact]] first (cheaper and lossless) — the
    standard pipeline order.

    ``verify``: ``"exact"`` (default; also accepts ``True``) joins candidates
    back to the in-row shingle arrays and emits exact ``jaccard``;
    ``"band"``/``False``/``"none"`` returns the raw candidate pairs — the
    right mode when a downstream :func:`connected_components` consumes the
    pairs anyway and band precision suffices (skips the verification joins
    entirely).

    Every stage is a hash shuffle on a high-cardinality key; the candidate
    verification joins only the candidate ids back to the shingle index, so
    the expensive exact step is proportional to candidates, not corpus².
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    verify = {True: "exact", False: "none", "band": "none"}.get(verify, verify)
    if verify not in ("exact", "none"):
        raise ValueError(f"verify must be 'exact', 'band', or 'none'; got {verify!r}")
    rows = num_hashes // bands
    df = _spread(df, id_col)
    # One pinned pass builds the shingle + hash arrays; signatures, the
    # bucket self-join, and verification all derive from it.
    # Pin ONLY (__id, __h64): signatures permute the hashes and the exact
    # verify intersects them, so the shingle STRINGS never need to leave
    # the projection — pinning them stored corpus-width text (~7x the
    # memory; the sf100 pin GC-thrashed an 8 GB heap) for no consumer.
    # eager=False: the bucket pin's count below is this frame's first reader
    # and is itself a single job — it fills this cache serially on the way
    # to the band hashes, so the eager count's extra stage (measured 5.0 s
    # of task-time at sf0.1, the old slowest-headline fat) buys nothing.
    # The verify joins read the then-warm cache. Heap-gated (r12): the
    # arrays are longs-only (~8 B/shingle ≈ 2x the on-disk text bytes in
    # cache), but still token-scale — past the 30%-heap cap the verify
    # joins re-derive instead of GC-thrashing, exactly the
    # _pinned_if_fits trade.
    est = _token_scale_est(df)
    coeffs = _minhash_coeffs(num_hashes, seed)
    if hash_fn == "md5" and SIGNATURE_ENGINE == "arrow":
        # Fused Arrow path: shingle build + md5 + permutation minima in ONE
        # numpy/hashlib kernel over the token arrays. The split JVM chain
        # evaluates concat_ws + md5 + conv inside transform() lambdas, which
        # run interpreted (no codegen inside HOF bodies) — measured 12.9 s
        # task-time at sf0.1 vs ~2 s fused, bit-identical h64/signatures
        # (guide §4.2). The pin carries (__id, __h64, __sig): h64 feeds the
        # verify joins, sig the band hashes — still longs-only, ~num_hashes
        # extra longs per doc on top of the shingle hashes.
        kernel = _md5_minhash_arrow(coeffs, n)
        arrays = _pinned_if_fits(
            _tokens_frame(df, text_col, id_col, n)
            .select("__id", kernel(F.col("__toks")).alias("__o"))
            .select(
                "__id",
                F.col("__o.h64").alias("__h64"),
                F.col("__o.sig").alias("__sig"),
            ),
            (2 * est) // 3 if est is not None else None,
            eager=False,
        )
        sig = arrays.select(
            F.col("__id").alias(id_col),
            *[
                F.element_at("__sig", k + 1).alias(f"__mh{k}")
                for k in range(num_hashes)
            ],
        )
    else:
        arrays = _pinned_if_fits(
            _doc_shingle_arrays(df, text_col, id_col, n, hash_fn).select(
                "__id", "__h64"
            ),
            (2 * est) // 3 if est is not None else None,
            eager=False,
        )
        sig = _signatures_from_arrays(arrays, coeffs, id_col)

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _hash64_multi(
                [F.col(f"__mh{b * rows + r}") for r in range(rows)], hash_fn
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    # Candidate pairs: two strategies emitting the same distinct
    # (id_a < id_b) set — see CANDIDATE_STRATEGY above for the measured
    # crossover and why unknown-size inputs take the group_pairs side.
    strategy = CANDIDATE_STRATEGY
    if strategy == "auto":
        from ffn_polars_spark.operators._scanmeta import scan_bytes

        sb = scan_bytes(df)
        strategy = (
            "self_join"
            if sb is not None and sb < _GROUP_PAIRS_MIN_BYTES
            else "group_pairs"
        )
    bucket_rows = sig.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array(*band_structs)).alias("__b"),
    ).select(
        "__id", F.col("__b.band").alias("__band"), F.col("__b.bh").alias("__bh")
    )
    if strategy == "group_pairs":
        # One hash exchange on (band, bh) collects each bucket's ids; pairs
        # are generated inside the reduce task from the id-sorted list (the
        # dedup_simhash shape). Single reader of the signature frame -> no
        # bucket pin, no eager count job.
        if max_bucket is not None:
            # r14 hot-bucket valve placement: count-and-filter BEFORE the
            # collect_list, via a window keyed like the groupBy (same hash
            # exchange — guide §2.4). The r13 shape filtered AFTER the
            # aggregate, so a degenerate bucket's full id-list still
            # materialized in one unspillable ObjectHashAggregate buffer
            # (1e9-doc boilerplate bucket = 8+ GB in one allocation →
            # executor OOM); the window's row buffer spills to disk, and
            # hot buckets are dropped before anything collects them.
            from pyspark.sql.window import Window

            w_b = Window.partitionBy("__band", "__bh")
            bucket_rows = (
                bucket_rows.withColumn("__bn", F.count(F.lit(1)).over(w_b))
                .where(F.col("__bn") <= int(max_bucket))
                .drop("__bn")
            )
        grouped = bucket_rows.groupBy("__band", "__bh").agg(
            F.collect_list("__id").alias("__ids")
        )
        cands = _bucket_pairs_streamed(
            grouped.where(F.size("__ids") >= 2).select(
                F.array_sort("__ids").alias("__ids")
            ),
            "__ids",
            lambda a, b: [a.alias("id_a"), b.alias("id_b")],
        ).distinct()
    else:
        # Pin the bucket table: both sides of the self-join (and nothing
        # else) read it, and it is tiny relative to the corpus (docs x
        # bands rows of three longs).
        buckets = _pinned(bucket_rows)
        if max_bucket is not None:
            # hot-bucket valve: a keyed window over the PINNED bucket table
            # (never the corpus), so the count costs one bucket-sized
            # exchange
            from pyspark.sql.window import Window

            w_b = Window.partitionBy("__band", "__bh")
            buckets = (
                buckets.withColumn("__bn", F.count(F.lit(1)).over(w_b))
                .where(F.col("__bn") <= int(max_bucket))
                .drop("__bn")
            )

        l, r = buckets.alias("l"), buckets.alias("r")
        cands = (
            l.join(
                r,
                (F.col("l.__band") == F.col("r.__band"))
                & (F.col("l.__bh") == F.col("r.__bh"))
                & (F.col("l.__id") < F.col("r.__id")),
            )
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
            .distinct()
        )
    if verify == "none":
        return cands

    # Exact-Jaccard verification on candidates only: join each side's in-row
    # HASH array (two hash joins keyed on doc id — candidate-proportional)
    # and intersect in place. Intersecting the 64-bit shingle hashes instead
    # of the shingle strings is value-identical up to a 2^-64 collision
    # (distinct strings hashing equal) and keeps the pinned frame longs-only;
    # the oracle twin intersects the same hashes, so parity is exact.
    a = arrays.select(F.col("__id").alias("id_a"), F.col("__h64").alias("__sha"))
    b = arrays.select(F.col("__id").alias("id_b"), F.col("__h64").alias("__shb"))
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size("__sha") + F.size("__shb") - inter
    # floor(x*1e6+0.5)/1e6, not F.round: identical IEEE ops in any engine,
    # so an external SQL oracle reproduces the value bit-for-bit.
    jacc = F.floor(
        (inter / union.cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ) / F.lit(1000000.0)
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jacc.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


@register(namespace="eod", kind="df", context="dataframe", alias="simhash_signatures")
def simhash_signatures(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document: sign-sum of shingle-hash bits.

    Per-document like minhash, so it's a single projection over the in-row
    hash array: bit j's counter is ``2 * count(hashes with bit j set) -
    |hashes|``; the fingerprint is reassembled with shifts. Engine choice as
    in ``_signatures_from_arrays`` (Arrow/numpy by default, pure-JVM HOF
    fallback; identical bits). In md5 mode the shingle build + hash + bit
    counts fuse into one Arrow kernel (see dedup_minhash_lsh — same
    interpreted-HOF cost, same bit-identical fusion).
    """
    if hash_fn == "md5" and SIGNATURE_ENGINE == "arrow":
        return _tokens_frame(df, text_col, id_col, n).select(
            F.col("__id").alias(id_col),
            _md5_simhash_arrow(n)(F.col("__toks")).alias("simhash"),
        )
    arrays = _doc_shingle_arrays(df, text_col, id_col, n, hash_fn)
    hashed = arrays.select(
        F.col("__id").alias(id_col), F.col("__h64").alias("__h"), F.size("__h64").alias("__n")
    )

    if SIGNATURE_ENGINE == "arrow":
        return hashed.select(id_col, _simhash_arrow()(F.col("__h")).alias("simhash"))

    def _bit_test(j: int):
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    sig = None
    for j in range(64):
        ones = F.size(F.filter(F.col("__h"), _bit_test(j)))
        bit = F.when(ones * 2 > F.col("__n"), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return hashed.select(id_col, sig.alias("simhash"))


def _simhash_arrow():
    from ffn_polars_spark.operators._arrow_kernels import make_simhash_udf

    return make_simhash_udf()


@register(namespace="eod", kind="df", context="dataframe", alias="dedup_simhash")
def dedup_simhash(
    df: DataFrame,
    max_hamming: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """SimHash near-duplicate pairs within a Hamming ball.

    Pigeonhole banding: with 4 16-bit chunks, any pair within Hamming ≤ 3
    agrees on at least one chunk, so candidates come from 4 chunk-equality
    joins (union'd via explode), then ``bit_count(xor)`` filters exactly.

    ``max_bucket`` (default None = uncapped, bit-identical to the oracle
    twin) drops 16-bit chunk buckets holding more than that many docs
    BEFORE they are collected — the dedup_minhash_lsh hot-bucket valve. A
    boilerplate chunk value shared by k docs emits C(k,2) candidates; docs
    in a dropped bucket can still pair through their other 3 chunks, so
    recall for true near-dups (which agree on most chunks) is ~unchanged.
    Set around 10³–10⁴ for web-scale corpora.
    """
    # r13: candidates via groupBy + in-bucket pair generation, exactly the
    # dedup_minhash_lsh restructure (see there for the full rationale): one
    # hash exchange on (chunk, val) collects each bucket's (id, simhash)
    # structs, and pairs + hamming are generated inside the reduce task from
    # the id-sorted list — the same (id_a < id_b, hamming) triples the chunk
    # self-join emitted. The signature frame now has a SINGLE reader, so the
    # eager `_pinned(sig)` — one construction-time count job over the full
    # corpus-signature derivation at every scale — is gone.
    sig = simhash_signatures(_spread(df, id_col), n, text_col, id_col, hash_fn)
    chunks = sig.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("__c"),
    ).select("__id", "simhash", F.col("__c.chunk").alias("__chunk"), F.col("__c.val").alias("__val"))

    if max_bucket is not None:
        # r14 hot-bucket valve: count-and-filter BEFORE collect_list on the
        # same (chunk, val) key — shares the groupBy's exchange, the window
        # buffer spills where the aggregate buffer cannot (see the
        # dedup_minhash_lsh group_pairs valve).
        from pyspark.sql.window import Window

        w_b = Window.partitionBy("__chunk", "__val")
        chunks = (
            chunks.withColumn("__bn", F.count(F.lit(1)).over(w_b))
            .where(F.col("__bn") <= int(max_bucket))
            .drop("__bn")
        )
    grouped = chunks.groupBy("__chunk", "__val").agg(
        F.collect_list(F.struct(F.col("__id"), F.col("simhash"))).alias("__ds")
    )
    return (
        _bucket_pairs_streamed(
            grouped.where(F.size("__ds") >= 2).select(
                F.array_sort("__ds").alias("__ds")
            ),
            "__ds",
            lambda a, b: [
                a.getField("__id").alias("id_a"),
                b.getField("__id").alias("id_b"),
                F.bit_count(
                    a.getField("simhash").bitwiseXOR(b.getField("simhash"))
                ).alias("hamming"),
            ],
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


@register(namespace="eod", kind="df", context="dataframe", alias="connected_components")
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a similarity-pair edge list:
    (node, component) where component = min node id reachable.

    Turns pairwise dedup output (minhash/simhash/jaccard pairs) into CLUSTER
    assignments — the step between "these documents look alike" and "keep
    one canonical copy per group".

    Iterative min-label propagation: each round every node takes the minimum
    of its own label and its neighbors' labels; converges in O(graph
    diameter) rounds (near-dup clusters are dense, so typically 2-4). Each
    iteration ``localCheckpoint``s the label frame — without it the plan
    doubles per round and the job dies on lineage, the classic iterative-
    algorithm failure on Spark. Convergence is detected by an aggregate
    (count of changed labels), one small job per round.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("__nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("__nbr"), F.col("comp"))).alias(
                    "__new"
                ),
                "comp",
            )
        )
        changed = new_labels.where(F.col("__new") != F.col("comp")).count()
        prev = labels
        labels = new_labels.select(
            "node", F.col("__new").alias("comp")
        ).localCheckpoint()  # eager: prev's blocks are dead now
        release_checkpoint(prev)
        if changed == 0:
            break
    edges.unpersist()
    # the final checkpoint backs the returned frame; release_pins() frees
    # its blocks once the caller has materialized (the frame stays usable —
    # the logical plan re-derives it)
    return pin_checkpoint(labels)


@register(namespace="eod", kind="df", context="dataframe", alias="dedup_assign_canonical")
def dedup_assign_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every document with its canonical id (the min id of its near-dup
    cluster; singletons are their own canonical) and an ``is_duplicate``
    flag — the materialized keep/drop decision for a dedup pipeline."""
    comps = connected_components(pairs, id_a, id_b)
    return (
        df.join(comps, df[id_col] == comps["node"], "left")
        .select(
            df[id_col],
            F.coalesce(F.col("comp"), df[id_col]).alias("canonical_id"),
        )
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


@register(namespace="eod", kind="df", context="dataframe", alias="dedup_cluster_stats")
def dedup_cluster_stats(
    assign: DataFrame, canonical_col: str = "canonical_id"
) -> DataFrame:
    """Duplicate-cluster size distribution over a canonical assignment
    (the output of [[dedup_canonical]] / ``dedup_assign_canonical``):
    how many clusters exist at each size, and how many documents they
    hold. The shape of this histogram is the dedup health-check — a fat
    tail of giant clusters means boilerplate or template spam; all-1
    clusters mean the threshold is too strict to matter.

    Two tiny hash aggregates over the assignment (both map-side partial):
    nothing here is corpus-sized after the first ``groupBy``. Returns
    ``(cluster_size, n_clusters, n_docs)``.
    """
    cl = assign.groupBy(canonical_col).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cl.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="dedup_incremental")
def dedup_incremental(
    new: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup of a NEW batch against an already-ingested
    history: drop rows whose normalized-text fingerprint appears in
    ``seen``, then keep one row (min id) per fingerprint within the batch
    itself — the shape a daily-crawl pipeline actually runs, where the
    history is orders of magnitude larger than the increment and must
    never be re-deduped whole ([[dedup_exact]] is the from-scratch
    variant).

    Scale: the history side reduces to DISTINCT fingerprints before the
    anti-join (fingerprint-cardinality, not row-cardinality, crosses the
    wire; both sides hash-partition on the fingerprint); the within-batch
    keep-first is one aggregate on the same key — the big history is
    scanned once, projected to one column.

    Returns the surviving new rows' ``(id, fingerprint)``.
    """
    fp = lambda d: d.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("fingerprint")
    )
    new_fp = fp(new)
    seen_fp = fp(seen).select("fingerprint").distinct()
    fresh = new_fp.join(seen_fp, "fingerprint", "left_anti")
    keep = fresh.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return keep.select(id_col, "fingerprint")


@register(namespace="eod", kind="df", context="dataframe", alias="containment_pairs")
def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """Asymmetric containment near-duplicate pairs: ``C(A→B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)|`` — the measure
    [[ngram_jaccard_pairs]]'s symmetric Jaccard systematically misses
    when one document QUOTES another (a paragraph wholly inside a long
    doc has high containment but low Jaccard; Broder's original dedup
    distinguished exactly these two). Emits pairs (id_a < id_b) where
    EITHER direction's containment clears ``threshold``, with both
    directions reported.

    Same inverted-shingle-index shape as the Jaccard variant (documents
    sharing zero shingles never meet; ``max_shingle_df`` drops
    stopword-shingles before the self-join), so the join is bounded by
    co-occurrence, not |docs|². Returns ``(id_a, id_b, containment_a,
    containment_b)``.
    """
    sh = _doc_shingles(_spread(df, id_col), text_col, id_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df")).where(
            F.col("__df") > max_shingle_df
        ).select("__sh")
        sh = sh.join(hot, "__sh", "left_anti")
    # token-scale STRING shingles: heap-gate like scrub_spans' span pin
    sh = _pinned_if_fits(sh, _token_scale_est(df))
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.__sh") == F.col("b.__sh")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__sz", "__sza"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__sz", "__szb"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("__inter") / F.col("__sza").cast("double"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("__inter") / F.col("__szb").cast("double"), 6).alias(
                "containment_b"
            ),
        )
    )
    return out.where(
        (F.col("containment_a") >= threshold)
        | (F.col("containment_b") >= threshold)
    )


@register(namespace="eod", kind="df", context="dataframe", alias="fuzzy_match_pairs")
def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    max_dist: int = 2,
    max_block: Optional[int] = None,
) -> DataFrame:
    """Blocked fuzzy record linkage: candidate pairs (id_a < id_b) within
    the same block whose ``levenshtein(text_a, text_b) ≤ max_dist`` — the
    classic entity-resolution shape (normalize → block → pairwise edit
    distance inside blocks only). Blocking is what makes this survive
    scale: the self-join is equi-keyed on ``block_col``, so cost is
    Σ block² rather than |rows|², and AQE splits oversized blocks; pick a
    block key (sort key prefix, phonetic code, LSH bucket) whose largest
    block is manageable. Levenshtein runs JVM-side (built-in, codegen) on
    the surviving candidates only.

    ``max_block`` is the scale guard (the [[ngram_jaccard_pairs]]
    hot-shingle idiom): blocks larger than the cutoff are dropped BEFORE
    the self-join — a block of b rows costs b²/2 comparisons, so one
    degenerate key value (measured: a 40k-row block = 800M pairs) must
    not be allowed to dominate the stage. Conservative direction for
    linkage: candidates are only ever lost from blocks the key failed to
    discriminate, which need a better key, not a bigger cluster.

    Returns ``(block, id_a, id_b, text_a, text_b, distance)``.
    """
    slim = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
    )
    if max_block is not None:
        hot = (
            slim.groupBy("__blk")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > int(max_block))
            .select("__blk")
        )
        slim = slim.join(hot, "__blk", "left_anti")
    a, b = slim.alias("a"), slim.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__blk") == F.col("b.__blk")) & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__blk").alias(block_col),
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        F.col("a.__txt").alias("text_a"),
        F.col("b.__txt").alias("text_b"),
        F.levenshtein(F.col("a.__txt"), F.col("b.__txt")).alias("distance"),
    )
    return pairs.where(F.col("distance") <= int(max_dist))


@register(namespace="eod", kind="df", context="dataframe", alias="sorted_fuzzy_pairs")
def sorted_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    max_dist: int = 2,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Sorted-neighborhood fuzzy linkage: sort records by the text key and
    compare each row only to its next ``window`` neighbors in sort order
    — the LINEAR-cost alternative to [[fuzzy_match_pairs]]'s blocking
    (measured: fixed-cardinality blocks grow quadratically, 13.6× cost
    at 10× data; the sliding window is O(n·w) by construction, so the
    same 10× costs ~10×). Lexicographic neighbors catch edit-distance
    matches whose DIFFERENCES are past the first characters; prefix
    edits need a second pass on a reversed or phonetic key — the
    standard multi-pass sorted-neighborhood method.

    One ordered window for the rank, an explode of each row to its
    ``window`` forward offsets, an equi-join on (keys, rank) — never a
    block self-join — then the JVM edit distance on candidates only.
    Returns ``(id_a, id_b, text_a, text_b, distance)``.
    """
    from pyspark.sql.window import Window

    keys = list(by or [])
    w = Window.partitionBy(*keys).orderBy(
        F.col("__txt").asc(), F.col("__id").asc()
    )
    ranked = df.select(
        *keys, F.col(id_col).alias("__id"), F.col(text_col).alias("__txt")
    ).withColumn("__rn", F.row_number().over(w))
    left = ranked.select(
        *keys, F.col("__id").alias("id_a"), F.col("__txt").alias("text_a"),
        F.explode(
            F.sequence(F.col("__rn") + 1, F.col("__rn") + F.lit(int(window)))
        ).alias("__rn"),
    )
    right = ranked.select(
        *keys, F.col("__rn"),
        F.col("__id").alias("id_b"), F.col("__txt").alias("text_b"),
    )
    pairs = left.join(right, keys + ["__rn"]).select(
        "id_a", "id_b", "text_a", "text_b",
        F.levenshtein(F.col("text_a"), F.col("text_b")).alias("distance"),
    )
    return pairs.where(F.col("distance") <= int(max_dist))


@register(namespace="eod", kind="df", context="dataframe", alias="shingle_novelty")
def shingle_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Corpus-order novelty score: the share of each document's distinct
    n-gram shingles whose FIRST appearance (lowest id in ingest order)
    is this document — 1.0 = all-new content, →0 = everything was
    already said. The freshness signal corpus curation ranks by after
    dedup: [[dedup_minhash_lsh]] removes copies, novelty quantifies how
    much each survivor adds.

    One distinct (shingle, id) frame, a min-id aggregate at shingle
    cardinality, one join back, one per-doc aggregate — no pair join at
    all (unlike the pairwise dedup family, attribution needs only the
    per-shingle minimum). Returns ``(id, n_shingles, n_novel,
    novelty)``; documents with no shingles are absent.
    """
    # token-scale STRING shingles: heap-gate like scrub_spans' span pin
    sh = _pinned_if_fits(
        _doc_shingles(_spread(df, id_col), text_col, id_col, n),
        _token_scale_est(df),
    )
    first = sh.groupBy("__sh").agg(F.min("__id").alias("__first"))
    joined = sh.join(first, "__sh")
    agg = joined.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("__id") == F.col("__first")).cast("long")).alias("n_novel"),
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_shingles",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")).alias(
            "novelty"
        ),
    )
