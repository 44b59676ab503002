"""Ingest-time data-quality gates: join-key profiling and time-series gap
detection.

Beyond the reference's surface (/root/reference/ffn_polars has no
data-quality layer): the checks a pipeline runs BEFORE trusting a new
batch — does the fact table still join, and is the tape missing bars?

Design notes (100 TB):

* ``join_profile`` reduces both sides to key-level frames first (map-side
  distinct / partial counts), so every join in the profile is
  key-cardinality-sized, not row-sized; the fact table is scanned once.
* ``detect_gaps`` explodes each key's expected bucket range from a
  staged (min, max) pair — an integer ``sequence`` generator, nothing
  interpreted — and anti-joins the observed buckets. Output is run-length
  merged (one row per contiguous gap), so a dead ticker produces one row,
  not a million.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ffn_polars_spark.core import safe_div
from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="join_profile")
def join_profile(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """Referential-integrity profile of a fact→dimension join: orphan
    facts (no dimension row), unused dimension keys, match rate, and the
    fan-out distribution (facts per dimension key) — the one-row report
    to gate a batch on before running the real join.

    ONE pass: the fact side collapses to (key, n) with a single
    map-side-combined aggregate, the dim side to flagged distinct keys,
    and every statistic comes out of one aggregate over their full-outer
    key join — the fact and dimension tables are each scanned exactly
    once regardless of how many metrics the report carries. NULL fact
    keys are counted separately (they match nothing by SQL semantics and
    usually indicate extraction bugs).

    Returns one row: ``(n_facts, n_null_keys, n_orphan_facts, match_rate,
    n_dim_keys, n_unused_dim_keys, max_fanout, avg_fanout)``.
    """
    fk = F.col(fact_key)
    fcounts = facts.groupBy(fk.alias("__k")).agg(F.count(F.lit(1)).alias("__n"))
    dkeys = dim.select(F.col(dim_key).alias("__k")).distinct().withColumn(
        "__d", F.lit(1)
    )
    j = fcounts.join(dkeys, "__k", "full_outer")
    is_fact = F.col("__n").isNotNull()
    is_null_key = is_fact & F.col("__k").isNull()
    has_dim = F.col("__d").isNotNull()
    matched_n = F.when(is_fact & has_dim, F.col("__n"))
    out = j.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("n_facts"),
        F.coalesce(F.sum(F.when(is_null_key, F.col("__n"))), F.lit(0)).alias(
            "n_null_keys"
        ),
        F.coalesce(
            F.sum(F.when(is_fact & ~is_null_key & ~has_dim, F.col("__n"))),
            F.lit(0),
        ).alias("n_orphan_facts"),
        F.coalesce(F.sum(matched_n), F.lit(0)).alias("__n_matched"),
        F.coalesce(F.max(matched_n), F.lit(0)).alias("max_fanout"),
        F.round(F.coalesce(F.avg(matched_n), F.lit(0.0)), 6).alias("avg_fanout"),
        F.coalesce(F.sum("__d"), F.lit(0)).alias("n_dim_keys"),
        F.coalesce(
            F.sum(F.when(has_dim & ~is_fact, F.lit(1))), F.lit(0)
        ).alias("n_unused_dim_keys"),
    )
    return out.select(
        "n_facts",
        "n_null_keys",
        "n_orphan_facts",
        F.round(
            F.when(F.col("n_facts") > 0, F.col("__n_matched") / F.col("n_facts")),
            6,
        ).alias("match_rate"),
        "n_dim_keys",
        "n_unused_dim_keys",
        "max_fanout",
        "avg_fanout",
    )


@register(namespace="eod", kind="df", context="dataframe", alias="detect_gaps")
def detect_gaps(
    df: DataFrame,
    ts_col: str = "ts_ns",
    key_col: str = "event_type",
    bucket_ns: int = 60_000_000_000,
) -> DataFrame:
    """Missing-bucket detection per key: which time buckets between each
    key's first and last activity have NO rows — dead feeds, exchange
    halts, ingestion holes. Contiguous missing buckets merge into one gap
    row (run-length via the bucket − row_number trick), so a long outage
    is one row, not thousands.

    Shapes: distinct (key, bucket) → per-key (min, max) → integer
    ``sequence`` explode of the expected range → anti-join observed →
    run-length aggregate. All shuffles are keyed on (key[, bucket]);
    expected rows per key are bounded by the key's active range / bucket.

    Returns ``(key, gap_start_bucket, gap_end_bucket, n_missing)``.
    """
    b = df.select(
        F.col(key_col).alias("__key"),
        F.floor(F.col(ts_col) / F.lit(int(bucket_ns))).alias("__bucket"),
    ).distinct()
    rng = b.groupBy("__key").agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    expected = rng.select(
        "__key", F.explode(F.sequence("__lo", "__hi")).alias("__bucket")
    )
    gaps = expected.join(b, ["__key", "__bucket"], "left_anti")
    w = Window.partitionBy("__key").orderBy("__bucket")
    runs = gaps.withColumn(
        "__grp", F.col("__bucket") - F.row_number().over(w)
    )
    return (
        runs.groupBy("__key", "__grp")
        .agg(
            F.min("__bucket").alias("gap_start_bucket"),
            F.max("__bucket").alias("gap_end_bucket"),
            F.count(F.lit(1)).alias("n_missing"),
        )
        .select(
            F.col("__key").alias(key_col),
            "gap_start_bucket",
            "gap_end_bucket",
            "n_missing",
        )
    )


@register(namespace="eod", kind="df", context="dataframe", alias="snapshot_diff")
def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Corpus version diff: classify every id across two snapshots as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing
    content fingerprints — the lineage record a training-data release
    needs ("what exactly moved between v3 and v4?") and the input to
    incremental re-processing (only ``added``+``changed`` need re-scoring).

    Content is compared by md5 of the raw content column (computed
    map-side on each snapshot — what crosses the join is (id, 32-byte
    hash), not documents), and the diff itself is one full-outer equi-join
    on the id. At 100 TB the hash projection is the difference between
    joining two corpora and joining two key columns.

    Returns ``(id, status)`` for every id in either snapshot.
    """
    o = old.select(F.col(id_col), F.md5(F.col(content_col)).alias("__ho"))
    n = new.select(F.col(id_col), F.md5(F.col(content_col)).alias("__hn"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


@register(namespace="eod", kind="df", context="dataframe", alias="gini_by_group")
def gini_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gini coefficient of a value's distribution inside each group — the
    data-balance diagnostic for corpus curation ("is one source's token
    budget concentrated in a few giant documents?"). 0 = perfectly even,
    →1 = one row holds everything. Pairs with [[cap_per_group]] /
    [[domain_mix]]: measure the imbalance, then cap or remix.

    Computed from the rank identity ``G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n``
    with ``x`` ascending and ``i`` the 1-based rank (ties broken by
    ``id_col`` — any total order gives the same sum, the tiebreak just
    keeps both engines identical). One ``row_number`` window per group
    then one aggregate on the same key — a single exchange, no join.
    NULL for groups whose total is zero (Gini undefined).

    Returns ``(group, gini, n, total)``.
    """
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(v.asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(group_col), v.alias("__v"), F.row_number().over(w).alias("__i")
    )
    n = F.count(F.lit(1)).cast("double")
    tot = F.sum("__v")
    gini = F.when(
        tot > 0,
        F.lit(2.0) * F.sum(F.col("__i") * F.col("__v")) / (n * tot)
        - (n + F.lit(1.0)) / n,
    )
    return ranked.groupBy(group_col).agg(
        gini.alias("gini"),
        n.cast("bigint").alias("n"),
        tot.alias("total"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="ks_drift")
def ks_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    a: str,
    b: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the ``value_col``
    distributions of sides ``a`` and ``b`` — the standard
    distribution-drift gate ("did this batch's quality scores / lengths /
    prices shift against the reference slice?"). Pairs with
    [[snapshot_diff]] (membership drift) and [[column_profile]] (moment
    drift): KS catches shape changes moments miss.

    Tie-correct and exact: counts per side collapse onto DISTINCT values
    first (so equal values contribute at one ECDF step, not in arbitrary
    row order), then both cumulative counts run through
    ``core.ranged_cumsum`` — the distributed global-cumsum idiom
    (range-repartition + per-partition window + broadcast offsets), never
    a single-partition window, so a 10⁹-distinct-value domain still
    parallelizes. ``KS = max |ECDF_a − ECDF_b|`` over the distinct
    values.

    Returns one row: ``(ks_stat, n_a, n_b, n_values)``.
    """
    from ffn_polars_spark.core import ranged_cumsum

    side = F.col(side_col)
    per = (
        df.where(side.isin(a, b))
        .groupBy(value_col)
        .agg(
            F.sum(F.when(side == a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(side == b, 1).otherwise(0)).alias("__cb"),
        )
    )
    cum, totals = ranged_cumsum(
        per,
        [value_col],
        {"__cca": F.col("__ca"), "__ccb": F.col("__cb")},
        return_totals=True,
    )

    # per-side totals are the cumsums' grand totals — already computed
    # driver-side by the offsets pass; the old aggregate branch re-read
    # `cum` and crossJoined it back (r11 plan audit). Literal columns on
    # the cum rows keep the empty-input semantics (first()-over-empty is
    # still NULL).
    def _long_lit(v):
        return (
            F.lit(None).cast("long") if v is None else F.lit(int(v)).cast("long")
        )

    return (
        cum.select(
            "*",
            _long_lit(totals["__cca"]).alias("__na"),
            _long_lit(totals["__ccb"]).alias("__nb"),
        )
        .agg(
            # NULL ks when either side is empty (ECDF undefined; the bare
            # division throws under ANSI) — same guard as wasserstein's
            F.max(
                F.when(
                    (F.col("__na") > 0) & (F.col("__nb") > 0),
                    F.abs(
                        F.col("__cca") / F.col("__na").cast("double")
                        - F.col("__ccb") / F.col("__nb").cast("double")
                    ),
                )
            ).alias("ks_stat"),
            F.first("__na").alias("n_a"),
            F.first("__nb").alias("n_b"),
            F.count(F.lit(1)).alias("n_values"),
        )
    )


@register(namespace="eod", kind="df", context="dataframe", alias="psi_drift")
def psi_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    a: str,
    b: str,
    lo: float,
    width: float,
    nbins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between sides ``a`` and ``b`` over
    FIXED-WIDTH bins — the industry-standard binned drift score
    (rule of thumb: < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted).
    Completes the drift suite: [[ks_drift]] (max ECDF deviation),
    [[vocab_jsd]] (token distributions), [[column_profile]] (moments),
    [[snapshot_diff]] (membership).

    Bins are ``clamp(floor((v − lo)/width), 0, nbins−1)`` — explicit
    ``lo``/``width`` parameters rather than data-dependent quantile cuts,
    so the binning is deterministic, engine-replayable, and comparable
    across batches (the point of a monitoring metric). Each side's bin
    share is clamped at ``eps`` before the log (the standard
    empty-bin convention); ``PSI = Σ (p_a − p_b)·ln(p_a/p_b)``.

    One (bin) aggregate carrying both sides (map-side partials bound the
    shuffle at ``nbins``), broadcast totals, one sum. Returns one row:
    ``(psi, n_a, n_b, n_bins_used)``.
    """
    side = F.col(side_col)
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.greatest(
            F.floor((v - F.lit(float(lo))) / F.lit(float(width))), F.lit(0)
        ),
        F.lit(int(nbins) - 1),
    )
    counts = (
        df.where(side.isin(a, b))
        .groupBy(bin_.alias("__bin"))
        .agg(
            F.sum(F.when(side == a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(side == b, 1).otherwise(0)).alias("__cb"),
        )
    )
    # side totals via a window over the <= nbins-row bin frame — the old
    # aggregate+crossJoin branch re-ran the data-sized bin aggregate
    wt = Window.partitionBy(F.lit(1))
    j = counts.withColumn("__na", F.sum("__ca").over(wt)).withColumn(
        "__nb", F.sum("__cb").over(wt)
    )
    e = F.lit(float(eps))
    # NULL-propagating guard on an EMPTY side (total 0): the bare 0/0
    # throws an ANSI DIVIDE_BY_ZERO, and greatest() SKIPS NULLs (it
    # would silently treat a missing side as eps) — so guard first, then
    # floor, so psi comes out NULL when either side has no rows at all
    # (r13 audit)
    p_raw = F.when(F.col("__na") > 0, F.col("__ca") / F.col("__na").cast("double"))
    q_raw = F.when(F.col("__nb") > 0, F.col("__cb") / F.col("__nb").cast("double"))
    p = F.when(p_raw.isNotNull(), F.greatest(p_raw, e))
    q = F.when(q_raw.isNotNull(), F.greatest(q_raw, e))
    return j.agg(
        F.sum((p - q) * F.log(p / q)).alias("psi"),
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="hhi_concentration")
def hhi_concentration(
    df: DataFrame,
    value_col: str,
    entity_col: str,
    group_col: str = None,
) -> DataFrame:
    """Herfindahl–Hirschman concentration of a value across entities inside
    each group: ``Σ sᵢ²`` over entity shares ``sᵢ`` — 1/n = perfectly even
    across n entities, 1 = a single entity holds everything. The
    market-concentration companion to [[gini_by_group]] (Gini measures
    row-level inequality; HHI measures how much of the total the top
    entities control), and the normalized variant
    ``(HHI − 1/n) / (1 − 1/n)`` rescales to [0, 1] for cross-group
    comparison (NULL for single-entity groups, where concentration is
    vacuous). NULL HHI for groups whose total is zero.

    Two stacked hash aggregates on prefixes of the same key — the second
    is entity-cardinality-sized, no window, no join.
    Returns ``(group, hhi, hhi_normalized, n_entities, total)``.
    """
    keys = [group_col] if group_col else []
    v = F.col(value_col).cast("double")
    per_entity = df.groupBy(*(keys + [entity_col])).agg(F.sum(v).alias("__ev"))
    g = per_entity.groupBy(*keys) if keys else per_entity.groupBy()
    agg = g.agg(
        F.sum(F.col("__ev") * F.col("__ev")).alias("__sq"),
        F.sum("__ev").alias("total"),
        F.count(F.lit(1)).alias("n_entities"),
    )
    tot = F.col("total")
    hhi = F.when(tot != 0, F.col("__sq") / (tot * tot))
    inv_n = F.lit(1.0) / F.col("n_entities").cast("double")
    hhi_norm = F.when(
        F.col("n_entities") > 1, (hhi - inv_n) / (F.lit(1.0) - inv_n)
    )
    return agg.select(
        *keys,
        hhi.alias("hhi"),
        hhi_norm.alias("hhi_normalized"),
        "n_entities",
        "total",
    )


@register(namespace="eod", kind="df", context="dataframe", alias="pruning_stats")
def pruning_stats(
    df: DataFrame,
    layout_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bucket_width: int,
    by: list = None,
) -> DataFrame:
    """Data-skipping effectiveness audit: bucket rows by the physical
    layout key (ingest-time buckets stand in for parquet row groups /
    files), collect each bucket's min/max of ``value_col``, and report
    how many buckets — and rows — a ``value BETWEEN lo AND hi`` predicate
    could skip on min/max stats alone. THE question to ask before
    re-clustering 100 TB: sorted-by-time data prunes time predicates for
    free, but a price predicate skips ~0 buckets unless the layout
    correlates ([[zorder_key]] is the fix this operator motivates and
    measures).

    One hash aggregate to bucket stats (bucket-cardinality output), one
    tiny roll-up. Returns ``(keys, n_buckets, n_pruned, rows_total,
    rows_pruned, prune_fraction)``.
    """
    keys = list(by or [])
    v = F.col(value_col).cast("double")
    bucket = F.floor(F.col(layout_col) / F.lit(int(bucket_width))).cast("long")
    per_bucket = (
        df.withColumn("__bkt", bucket)
        .groupBy(*(keys + ["__bkt"]))
        .agg(
            F.min(v).alias("__lo"),
            F.max(v).alias("__hi"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    pruned = (F.col("__hi") < F.lit(float(lo))) | (F.col("__lo") > F.lit(float(hi)))
    g = per_bucket.groupBy(*keys) if keys else per_bucket.groupBy()
    agg = g.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(pruned.cast("long")).alias("n_pruned"),
        F.sum("__n").alias("rows_total"),
        F.sum(F.when(pruned, F.col("__n")).otherwise(F.lit(0))).alias("rows_pruned"),
    )
    return agg.select(
        *keys,
        "n_buckets",
        "n_pruned",
        "rows_total",
        "rows_pruned",
        (F.col("rows_pruned").cast("double") / F.col("rows_total").cast("double")).alias(
            "prune_fraction"
        ),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="pareto_front")
def pareto_front(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list = None,
    id_col: str = None,
) -> DataFrame:
    """Pareto (skyline) frontier per group, maximizing both objectives: a
    point survives iff no other point is ≥ on both axes and > on at
    least one — the multi-objective shortlist (price/quality corpora,
    risk/return portfolios, latency/recall configs).

    The classic sweep, distributed: after collapsing exact (x, y)
    duplicates to one representative (min id), sort each group by
    ``x DESC, y DESC`` and keep rows whose ``y`` strictly exceeds the
    running max of ``y`` over all earlier rows — one ordered window, one
    exchange, no pairwise join (the O(n²) dominance test is what this
    replaces). Returns ``(keys, x, y, id)`` frontier rows.
    """
    from pyspark.sql.window import Window

    keys = list(by or [])
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    agg_cols = [F.min(id_col).alias(id_col)] if id_col else [
        F.count(F.lit(1)).alias("__dup")
    ]
    pts = df.groupBy(*(keys + [x_col, y_col])).agg(*agg_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(x.desc(), y.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(y).over(w)
    out = pts.withColumn("__pm", prev_max).where(
        F.col("__pm").isNull() | (y > F.col("__pm"))
    )
    keep = keys + [x_col, y_col] + ([id_col] if id_col else [])
    return out.select(*keep)


@register(namespace="eod", kind="df", context="dataframe", alias="wasserstein_distance")
def wasserstein_distance(
    df: DataFrame,
    value_col: str,
    side_col: str,
    a: str,
    b: str,
) -> DataFrame:
    """Two-sample 1-Wasserstein (earth-mover) distance between the
    ``value_col`` distributions of sides ``a`` and ``b``:
    ``W₁ = ∫ |ECDF_a − ECDF_b| dx`` — the drift gate that, unlike
    [[ks_drift]]'s max-gap, keeps units (it reads as "average value
    displacement") and unlike [[psi_drift]] needs no binning. The
    three drift statistics share one shape: counts collapsed onto
    distinct values, then global cumulative sums.

    Exact, not sampled: per-side counts collapse onto DISTINCT values,
    both cumulative counts plus a distinct-value rank run through
    ``core.ranged_cumsum`` (the distributed global-cumsum idiom —
    never a single-partition window), and the adjacent-value gaps
    ``x_{i+1} − x_i`` come from an equi-join on consecutive ranks
    (rank is itself a cumsum, so no global lead window either). W₁
    sums ``|F_a − F_b|·gap`` over the joined pairs. Returns one row:
    ``(w1, n_a, n_b, n_values)``.
    """
    from ffn_polars_spark.core import ranged_cumsum

    side = F.col(side_col)
    per = (
        df.where(side.isin(a, b) & F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("__x"))
        .agg(
            F.sum(F.when(side == a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(side == b, 1).otherwise(0)).alias("__cb"),
        )
    )
    cum, totals = ranged_cumsum(
        per,
        ["__x"],
        {
            "__cca": F.col("__ca"),
            "__ccb": F.col("__cb"),
            "__rk": F.lit(1),
        },
        return_totals=True,
    )
    # per-side totals and the distinct-value count ARE the cumsums' grand
    # totals, which ranged_cumsum's offsets pass computed driver-side — a
    # second full aggregate over `cum` + crossJoin was the plan audit's
    # avoidable exchange pair here (r11). Attached as literal columns to
    # the pair rows so the degenerate cases (empty input, a single
    # distinct value -> no consecutive pairs) keep emitting all-NULL
    # through the final first()-over-empty aggregate, exactly as before.
    def _long_lit(v):
        return (
            F.lit(None).cast("long") if v is None else F.lit(int(v)).cast("long")
        )

    left = cum.select("__x", "__cca", "__ccb", "__rk")
    right = cum.select(
        F.col("__x").alias("__xn"), (F.col("__rk") - 1).alias("__rk")
    )
    pairs = left.join(right, "__rk").select(
        "*",
        _long_lit(totals["__cca"]).alias("__na"),
        _long_lit(totals["__ccb"]).alias("__nb"),
        _long_lit(totals["__rk"]).alias("__nv"),
    )
    contrib = pairs.select(
        F.when(
            (F.col("__na") > 0) & (F.col("__nb") > 0),
            F.abs(
                F.col("__cca") / F.col("__na").cast("double")
                - F.col("__ccb") / F.col("__nb").cast("double")
            )
            * (F.col("__xn") - F.col("__x")),
        ).alias("__c"),
        "__na",
        "__nb",
        "__nv",
    )
    # empty-side guard: W1 is undefined against an empty sample -> NULL,
    # never an ANSI divide-by-zero
    return contrib.agg(
        F.when(
            (F.first("__na") > 0) & (F.first("__nb") > 0),
            F.coalesce(F.sum("__c"), F.lit(0.0)),
        ).alias("w1"),
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.first("__nv").alias("n_values"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="lateness_stats")
def lateness_stats(
    df: DataFrame,
    ts_col: str,
    arrival_col: str,
    by=None,
) -> DataFrame:
    """Out-of-orderness profile of an event stream: in ARRIVAL order
    (``arrival_col`` — ingestion sequence, offset, file position), how
    often does event time run backwards, and by how much?
    ``lateness = max(previous event times) − event time`` when
    positive — exactly the quantity a Structured Streaming watermark
    (`withWatermark`) must exceed to avoid dropping data, measured
    here so the streaming ops' delay threshold is a number, not a
    guess.

    One ordered window per key (running max of event time over
    preceding arrivals) + one aggregate. Returns ``(*keys, n, n_late,
    frac_late, max_lateness, avg_lateness)`` — avg over LATE events
    only, NULL when nothing is late.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    ts = F.col(ts_col).cast("double")
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy(arrival_col)
    prev_max = F.max(ts).over(w.rowsBetween(Window.unboundedPreceding, -1))
    late = F.when(prev_max > ts, prev_max - ts).otherwise(F.lit(0.0))
    staged = df.select(*keys, late.alias("__late"))
    g = staged.groupBy(*keys) if keys else staged.groupBy()
    n_late = F.sum(F.when(F.col("__late") > 0, 1).otherwise(0)).cast("long")
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        n_late.alias("n_late"),
        (
            n_late.cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("frac_late"),
        F.max("__late").alias("max_lateness"),
        F.when(
            n_late > 0,
            F.sum("__late") / n_late.cast("double"),
        ).alias("avg_lateness"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="column_overlap")
def column_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    cols_a,
    cols_b,
) -> DataFrame:
    """Instance-based schema matching: for every (column of A, column
    of B) pair, the Jaccard overlap of their DISTINCT value sets
    (values compared as strings, NULLs excluded) — the "which column
    is the join key?" diagnostic run before wiring up an unfamiliar
    feed, and the evidence [[join_profile]] assumes when it checks a
    DECLARED key.

    Each side unpivots to (column, value) with one explode over a
    struct array (one scan per table regardless of column count),
    collapses to distinct pairs, and the overlap is a single equi-join
    on the value string — never a per-column-pair loop over the data.
    The zero-overlap grid is completed from the per-column distinct
    counts (column-cardinality frames). Returns ``(col_a, col_b,
    n_common, n_a, n_b, jaccard)``.
    """
    def unpivot(df, cols, name):
        arr = F.array(
            *[
                F.struct(
                    F.lit(c).alias("c"), F.col(c).cast("string").alias("v")
                )
                for c in cols
            ]
        )
        e = df.select(F.explode(arr).alias("__e")).select(
            F.col("__e.c").alias(name), F.col("__e.v").alias("__v")
        )
        return e.where(F.col("__v").isNotNull()).distinct()

    ua = unpivot(df_a, list(cols_a), "col_a")
    ub = unpivot(df_b, list(cols_b), "col_b")
    common = ua.join(ub, "__v").groupBy("col_a", "col_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    na = ua.groupBy("col_a").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = ub.groupBy("col_b").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    grid = na.crossJoin(nb).join(common, ["col_a", "col_b"], "left").fillna(
        0, subset=["n_common"]
    )
    uni = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return grid.select(
        "col_a", "col_b", "n_common", "n_a", "n_b",
        (F.col("n_common").cast("double") / uni.cast("double")).alias("jaccard"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="abc_analysis")
def abc_analysis(
    df: DataFrame,
    key_col: str,
    value_col: str,
    t_a: float = 0.8,
    t_b: float = 0.95,
) -> DataFrame:
    """ABC / Pareto contribution classes: aggregate value per key, rank
    keys by contribution, and classify — ``A`` keys start before the
    cumulative share reaches ``t_a`` (the crossing key is included,
    the standard convention, stated so any engine replays it), ``B``
    before ``t_b``, ``C`` the tail — the "vital few" cut behind
    inventory policy, domain capping, and hot-key triage, reading off
    the same concentration [[gini_by_group]] and [[hhi_concentration]]
    score. One aggregate to key cardinality, then ``core.ranged_cumsum``
    over the contribution ordering (descending value, key ascending for
    deterministic ties) — never a single-partition window. The
    previous-row cumulative needs no lag: it is ``cum − own``. Returns
    ``(key, value, share, cum_share, abc_class)``.
    """
    from ffn_polars_spark.core import ranged_cumsum

    per = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum(F.col(value_col).cast("double")).alias("__v")
    )
    per = per.withColumn("__negv", -F.col("__v"))
    cum, totals = ranged_cumsum(
        per, ["__negv", "__k"], {"__cum": F.col("__v")}, return_totals=True
    )
    # grand total falls out of the cumsum's own offsets pass — a second
    # full aggregate over `cum` plus a crossJoin(broadcast) was the
    # plan audit's one avoidable exchange pair here
    tot = F.lit(totals["__cum"]).cast("double")
    j = cum
    # all-zero corpus → grand total 0.0 → NULL shares (and class "C" via
    # the otherwise branch) instead of an ANSI divide-by-zero throw
    share = safe_div(F.col("__v"), tot)
    cum_share = safe_div(F.col("__cum"), tot)
    prev_share = safe_div(F.col("__cum") - F.col("__v"), tot)
    cls = (
        F.when(prev_share < F.lit(float(t_a)), "A")
        .when(prev_share < F.lit(float(t_b)), "B")
        .otherwise("C")
    )
    return j.select(
        F.col("__k").alias(key_col),
        F.col("__v").alias("value"),
        share.alias("share"),
        cum_share.alias("cum_share"),
        cls.alias("abc_class"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="qq_data")
def qq_data(
    df: DataFrame,
    value_col: str,
    side_col: str,
    a: str,
    b: str,
    quantiles=None,
) -> DataFrame:
    """Quantile–quantile frame between two samples: the exact
    interpolated quantiles of side ``a`` against side ``b`` at a shared
    probability grid (percentiles 5..95 by default) — the
    WHERE-does-the-distribution-shift view that [[ks_drift]] (max gap)
    and [[wasserstein_distance]] (integrated gap) reduce to scalars; a
    QQ row far off the diagonal localizes the drift to a quantile band.

    Two exact-percentile aggregates (one per side, each one shuffle of
    that side's values) joined on the probability — output cardinality
    = grid size. Returns ``(q, quantile_a, quantile_b, diff)``.
    """
    qs = list(quantiles) if quantiles is not None else [
        round(0.05 * i, 2) for i in range(1, 20)
    ]
    side = F.col(side_col)
    v = F.col(value_col).cast("double")

    def one(tag, name):
        vals = df.where(side == tag).select(v.alias("__v"))
        aggs = [
            F.percentile("__v", F.lit(float(q))).alias(f"__q{i}")
            for i, q in enumerate(qs)
        ]
        wide = vals.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(float(q)).alias("q"),
                    F.col(f"__q{i}").alias(name),
                )
                for i, q in enumerate(qs)
            ]
        )
        return wide.select(F.explode(pairs).alias("__e")).select(
            F.col("__e.q").alias("q"), F.col(f"__e.{name}").alias(name)
        )

    qa = one(a, "quantile_a")
    qb = one(b, "quantile_b")
    return qa.join(qb, "q").select(
        "q", "quantile_a", "quantile_b",
        (F.col("quantile_a") - F.col("quantile_b")).alias("diff"),
    )
