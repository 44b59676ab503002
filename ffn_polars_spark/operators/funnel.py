"""Event-journey analytics: ordered funnels and cohort retention.

Beyond the reference's surface (/root/reference/ffn_polars has no
event-stream analytics): the two standard questions asked of an
``events(user_id, event_type, ts)`` table at any scale — "how many users
progress through these stages, in order?" and "of the users who arrived in
week W, how many came back k weeks later?".

Design notes (100 TB):

* Both operators reduce the event table to ONE row per user before doing
  anything quadratic-looking: funnel progress is computed from per-user
  first-occurrence timestamps (a single groupBy), retention joins the
  per-user cohort row back on the user key (equi-join, AQE-skew-safe).
  Nothing is ever keyed on time alone, so hot event-types don't skew.
* The funnel's per-stage output is built by exploding a FIXED-SIZE literal
  array of stage structs — measured not to trigger the Generate
  re-evaluation pathology (same shape as the minhash band explode).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ffn_polars_spark.registry import register


@register(namespace="eod", kind="df", context="dataframe", alias="funnel_stages")
def funnel_stages(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Ordered-funnel conversion: for each prefix of ``stages``, the number
    of users whose FIRST occurrences happen in stage order
    (``t_0 < t_1 < ... < t_i``, strict — simultaneous events don't count
    as progress).

    One groupBy collapses the events to a per-user row of first-occurrence
    timestamps (min over a CASE — map-side partial min, so the shuffle
    carries one row per user per partition at most); stage counts are then
    a single global aggregate over user rows. No joins, no window over the
    raw events.

    Returns one row per stage: ``(stage, stage_name, n_users, conversion)``
    where ``conversion`` is the fraction of the previous stage's users
    (1.0 for stage 0; NULL if the previous stage is empty).
    """
    stages = list(stages)
    if not stages:
        raise ValueError("stages must be non-empty")
    firsts = df.where(F.col(type_col).isin(stages)).groupBy(user_col).agg(
        *[
            F.min(
                F.when(F.col(type_col) == s, F.col(ts_col))
            ).alias(f"__t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached: List[Column] = []
    for i in range(len(stages)):
        cond = F.col("__t0").isNotNull()
        for j in range(1, i + 1):
            cond = cond & (F.col(f"__t{j-1}") < F.col(f"__t{j}"))
        # when/otherwise(0), not cast: a stage nobody reaches is an
        # all-NULL condition whose bare sum would be NULL rather than 0;
        # coalesce: a corpus with NO funnel events at all makes `firsts`
        # EMPTY and even the otherwise(0) sum aggregates over zero rows
        # to NULL — the count contract is 0 either way
        reached.append(
            F.coalesce(
                F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).alias(f"__n{i}")
        )
    counts = firsts.agg(*reached)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(s).alias("stage_name"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    exploded = counts.select(F.explode(rows).alias("r")).select("r.*")
    # len(stages) rows total: the single-partition lag window is trivial
    prev = F.lag("n_users").over(Window.orderBy("stage"))
    return exploded.select(
        "stage",
        "stage_name",
        "n_users",
        F.round(
            F.when(F.col("stage") == 0, F.lit(1.0)).otherwise(
                F.when(prev > 0, F.col("n_users") / prev)
            ),
            6,
        ).alias("conversion"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="cohort_retention")
def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    period_ns: int = 7 * 24 * 3600 * 1_000_000_000,
    max_offset: Optional[int] = None,
) -> DataFrame:
    """Cohort retention: bucket users by the period of their first event
    (the cohort), then count how many distinct cohort members are active
    at each later period offset.

    Two shuffles keyed on the user id (first-event aggregate + join back —
    equi-join on a high-cardinality uniform key, so AQE skew handling
    applies) and one (cohort, offset) distinct-count aggregate whose input
    is already deduplicated to (cohort, offset, user) triples — map-side
    distinct keeps the wire volume at active-users × offsets, not events.

    Returns ``(cohort_start, offset, n_users, retention)`` where
    ``retention`` is the fraction of the cohort's size at offset 0.
    """
    p = F.lit(int(period_ns))
    firsts = df.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = firsts.select(
        user_col, (F.col("__first_ts") - F.col("__first_ts") % p).alias("__cohort")
    )
    joined = df.join(cohort, user_col).select(
        user_col,
        "__cohort",
        ((F.col(ts_col) - F.col(ts_col) % p) - F.col("__cohort")).alias("__off_ns"),
    )
    trip = joined.select(
        user_col, "__cohort", (F.col("__off_ns") / p).cast("int").alias("offset")
    )
    if max_offset is not None:
        trip = trip.where(F.col("offset") <= F.lit(int(max_offset)))
    counts = trip.groupBy("__cohort", "offset").agg(
        F.countDistinct(user_col).alias("n_users")
    )
    base = F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(
        Window.partitionBy("__cohort")
    )
    return counts.select(
        F.col("__cohort").alias("cohort_start"),
        "offset",
        "n_users",
        F.round(
            F.when(base > 0, F.col("n_users") / base), 6
        ).alias("retention"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="transition_matrix")
def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ns",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    (from, to) pair, the transition count and ``P(to | from)`` — the
    journey-structure summary behind funnel design and anomaly detection
    (a spike in view->error says more than either count alone).

    One lag window per user (ordered by ts, optional tiebreak for
    duplicate timestamps) and one (from, to) aggregate. The window
    partitions on the user key — high-cardinality, so parallelism scales
    with users, and the aggregate's input is one row per event. The
    row-probability denominator comes from a window over the (from, to)
    matrix itself (|types|² rows), not the events.

    Returns ``(from_type, to_type, n, prob)``.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = df.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / row_total, 6).alias("prob"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="market_basket")
def market_basket(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Pairwise association rules (the k=2 frequent-itemset core of
    Apriori): for every item pair co-occurring in at least one basket,
    the co-occurrence count, support, both conditional confidences, and
    lift (``> 1`` = the pair appears together more than independence
    predicts). Baskets are whatever groups items: users grouping the
    event types they touch, sessions grouping pages, orders grouping
    parts.

    Shape: DISTINCT (basket, item) first — duplicates inside a basket
    never reach the join — then an equi-self-join ON THE BASKET KEY
    (cost Σ basket-size², the Apriori bound, never |items|²) and one
    aggregate to the item-pair-sized output; singles and the basket
    total broadcast in. All counts are exact integers.

    Returns ``(item_a, item_b, n_co, support, confidence_a, confidence_b,
    lift)``.
    """
    bi = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = bi.select("__b").distinct().count()
    singles = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__n1"))
    a, b = bi.alias("a"), bi.alias("b")
    co = (
        a.join(b, (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__i") < F.col("b.__i")))
        .groupBy(F.col("a.__i").alias("item_a"), F.col("b.__i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    na = singles.select(F.col("__i").alias("item_a"), F.col("__n1").alias("__na"))
    nb = singles.select(F.col("__i").alias("item_b"), F.col("__n1").alias("__nb"))
    nco = F.col("n_co").cast("double")
    nN = F.lit(float(n_baskets))
    return (
        co.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_co",
            (nco / nN).alias("support"),
            (nco / F.col("__na").cast("double")).alias("confidence_a"),
            (nco / F.col("__nb").cast("double")).alias("confidence_b"),
            (
                nco * nN
                / (F.col("__na").cast("double") * F.col("__nb").cast("double"))
            ).alias("lift"),
        )
    )


@register(namespace="eod", kind="df", context="dataframe", alias="temporal_cooccurrence")
def temporal_cooccurrence(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    item_col: str,
    window: int,
) -> DataFrame:
    """Temporal co-occurrence counts: item pairs observed for the same
    key within ``window`` time units of each other — [[market_basket]]
    with a clock (basket = a sliding window instead of the whole
    history), the motif counter behind "error follows purchase within
    5 minutes" questions.

    The time-bucket decomposition (operators/ranges.py's idiom): the
    left side explodes to its bucket and both neighbors, the join is
    pure equi on (key, bucket) — a pair within Δ always lands in
    adjacent buckets, and each qualifying pair matches on exactly ONE
    bucket value (the right row's own), so no dedup pass is needed. The
    exact ``|Δt| ≤ window`` filter and item ordering run on candidates
    only. Returns ``(item_a, item_b, n_co)``.
    """
    b = F.floor(F.col(ts_col) / F.lit(int(window))).cast("long")
    left = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ta"),
        F.col(item_col).alias("__ia"),
        F.explode(
            F.array(b - F.lit(1), b, b + F.lit(1))
        ).alias("__bkt"),
    )
    right = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__tb"),
        F.col(item_col).alias("__ib"),
        b.alias("__bkt"),
    )
    pairs = left.join(right, ["__k", "__bkt"]).where(
        (F.col("__ia") < F.col("__ib"))
        & (F.abs(F.col("__ta") - F.col("__tb")) <= F.lit(int(window)))
    )
    return pairs.groupBy(
        F.col("__ia").alias("item_a"), F.col("__ib").alias("item_b")
    ).agg(F.count(F.lit(1)).alias("n_co"))


@register(namespace="eod", kind="df", context="dataframe", alias="event_ngrams")
def event_ngrams(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    item_col: str,
    n: int = 2,
    order_tiebreak: Optional[str] = None,
) -> DataFrame:
    """Sequential n-gram motifs: counts of each run of ``n`` CONSECUTIVE
    items per key in time order — the order-sensitive companion to
    [[temporal_cooccurrence]] (a basket says "error and purchase
    co-occur"; the bigram says "error *follows* purchase"), and the
    session-path miner behind "what do users do right after signup?".

    One window pass (``n−1`` leads over the same (key, ts) sort — a
    single exchange, one WindowExec) then a hash aggregate on the
    gram; output cardinality = distinct item-paths, never row count.
    Ties in ``ts_col`` are broken by ``order_tiebreak`` (pass a unique
    id when timestamps can collide, so every engine walks the same
    sequence). Returns ``(gram, n_occurrences, n_keys)`` where ``gram``
    joins the items with ``"->"`` and ``n_keys`` counts distinct keys
    the motif appears under.
    """
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    parts = [F.col(item_col)] + [
        F.lead(item_col, i).over(w) for i in range(1, int(n))
    ]
    staged = df.select(
        F.col(key_col).alias("__k"),
        F.when(
            parts[-1].isNotNull(), F.concat_ws("->", *parts)
        ).alias("gram"),
    ).where(F.col("gram").isNotNull())
    return staged.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("__k").alias("n_keys"),
    )


@register(namespace="eod", kind="df", context="dataframe", alias="transition_entropy")
def transition_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ns",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Predictability of the event-type Markov chain: per source state,
    the Shannon entropy of the next-state distribution ``H(to|from) =
    −Σ p·log₂ p``, plus one ``__overall__`` row with the conditional
    entropy rate ``H(next|cur) = Σ P(from)·H(to|from)`` — the
    information-theoretic summary of [[transition_matrix]] ("how
    random are journeys FROM this state?"; bots and loops show up as
    near-zero rows, chaotic UIs as near-``log₂|types|``).

    Same one-lag-window + one-aggregate shape as transition_matrix;
    everything after the (from, to) count runs at |types|²
    cardinality. Counts are exact; only log₂ and the final weighted
    sum round. Returns ``(from_type, entropy, n_out, n)`` where
    ``n_out`` is the distinct successor count and ``n`` the outgoing
    transitions.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = df.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    row_total = F.sum("__c").over(Window.partitionBy("from_type"))
    p = F.col("__c").cast("double") / row_total.cast("double")
    per_cell = counts.select(
        "from_type",
        (-p * F.log2(p)).alias("__h"),
        F.col("__c").alias("__c"),
    )
    rows = per_cell.groupBy("from_type").agg(
        F.sum("__h").alias("entropy"),
        F.count(F.lit(1)).cast("long").alias("n_out"),
        F.sum("__c").cast("long").alias("n"),
    )
    total = F.sum("n").over(Window.partitionBy(F.lit(1)))
    overall = rows.select(
        F.lit("__overall__").alias("from_type"),
        (F.col("entropy") * F.col("n").cast("double") / total.cast("double")).alias("__wh"),
        F.col("n_out"),
        F.col("n"),
    ).groupBy("from_type").agg(
        F.sum("__wh").alias("entropy"),
        F.sum("n_out").cast("long").alias("n_out"),
        F.sum("n").cast("long").alias("n"),
    )
    return rows.unionByName(overall)


@register(namespace="eod", kind="df", context="dataframe", alias="time_to_convert")
def time_to_convert(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    from_event: str,
    to_event: str,
    by=None,
    quantiles=(0.5, 0.9),
) -> DataFrame:
    """Conversion latency: per user, the time from the FIRST
    ``from_event`` to the first ``to_event`` AT OR AFTER it, summarized
    per cohort as conversion rate + latency quantiles — the "how long
    does signup→purchase take?" panel that [[funnel_stages]] (counts)
    and [[cohort_retention]] (survival by period) don't answer.

    One ordered window per user (running seen-flag, so the target event
    must FOLLOW the source — a purchase before signup never counts) +
    one per-user aggregate + one cohort aggregate with exact
    interpolated quantiles (``F.percentile``, the [[group_quantiles]]
    convention). A cohort column must be constant per user (it rides
    through ``F.first``). Returns ``(*by, n_started, n_converted,
    conversion_rate, p50_delta, p90_delta, ...)`` — deltas in
    ``ts_col``'s unit.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    ts = F.col(ts_col).cast("double")
    w = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    started = F.max(
        F.when(F.col(type_col) == from_event, F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    staged = df.select(
        *keys,
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        ts.alias("__ts"),
        started.alias("__seen"),
    )
    per_user = staged.groupBy("__u").agg(
        *[F.first(k).alias(k) for k in keys],
        F.min(F.when(F.col("__t") == from_event, F.col("__ts"))).alias("__t0"),
        F.min(
            F.when(
                (F.col("__t") == to_event) & (F.col("__seen") == 1),
                F.col("__ts"),
            )
        ).alias("__t1"),
    )
    conv = per_user.where(F.col("__t0").isNotNull())
    delta = F.when(
        F.col("__t1").isNotNull(), F.col("__t1") - F.col("__t0")
    )
    g = conv.groupBy(*keys) if keys else conv.groupBy()
    n_started = F.count(F.lit(1)).cast("long")
    n_converted = F.count(delta).cast("long")
    aggs = [
        n_started.alias("n_started"),
        n_converted.alias("n_converted"),
        # NULL rate when nobody started (0/0 throws under ANSI — a cohort
        # with converters-but-no-starters is exactly the degenerate slice
        # this panel gets pointed at)
        F.when(
            n_started > 0, n_converted.cast("double") / n_started.cast("double")
        ).alias("conversion_rate"),
    ]
    for q in quantiles:
        qn = f"{q * 100:g}".replace(".", "_")
        aggs.append(F.percentile(delta, F.lit(float(q))).alias(f"p{qn}_delta"))
    return g.agg(*aggs)


@register(namespace="eod", kind="df", context="dataframe", alias="session_paths")
def session_paths(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    max_events: int = 5,
    top_k: int = 20,
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Most common session openings: each user's first ``max_events``
    event types in time order, joined with ``->``, counted, top-k — the
    whole-journey complement to [[event_ngrams]] (which counts motifs
    anywhere) and the empirical prior [[transition_matrix]] factorizes
    away. Ties in the top-k cut break on the path string, so every
    engine returns the same list.

    One ordered collect per user (``sort_array`` over (ts, type)
    structs — deterministic regardless of shuffle order), one path
    aggregate at path cardinality, one WindowGroupLimit cut. Returns
    ``(path, n_users, rank)``.
    """
    order_cols = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    pair = F.struct(*order_cols, F.col(type_col).alias("__t"))
    per_user = df.groupBy(user_col).agg(
        F.sort_array(F.collect_list(pair)).alias("__evs")
    )
    path = F.concat_ws(
        "->",
        F.transform(
            F.slice(F.col("__evs"), 1, int(max_events)), lambda s: s["__t"]
        ),
    )
    counts = per_user.select(path.alias("path")).groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("n_users").desc(), F.col("path").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(top_k)))
    )
