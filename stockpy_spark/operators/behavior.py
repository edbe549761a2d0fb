"""User-behavior analytics: ordered funnels and cohort retention.

Classic product-analytics operators over an event stream — the shapes a
warehouse user runs daily. Both are pure relational compositions
(grouped conditional aggregates + joins), no UDFs, and both are exactly
replayable by a SQL oracle: timestamps compare bit-identically and the
only floats are none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the timestamp at which each
    funnel step was first completed IN ORDER (step i counts only at the
    earliest event of that type strictly after step i-1's completion),
    plus ``stage`` = number of steps completed. Returns
    (user_col, stage, t1..tN).

    Scale shape: one grouped aggregate per step — pass i computes
    min(ts) WHERE type = steps[i] AND ts > t_{i-1} via a conditional
    aggregate after joining the previous pass's per-user frame (keyed,
    co-partitioned joins on the user key; the per-user frames are tiny
    relative to the event stream). len(steps) passes total, no windows,
    no per-user sorting — at 100 TB each pass is a map-side-combined
    shuffle on the same key, and AQE reuses the exchange.
    """
    out: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        ev = events.select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("__t"),
            F.col(ts_col).alias("__ts"),
        )
        if out is None:
            cur = ev.filter(F.col("__t") == step).groupBy("__u").agg(
                F.min("__ts").alias(f"t{i}")
            )
            out = cur
        else:
            prev_col = f"t{i - 1}"
            cur = (
                ev.join(out.select("__u", prev_col), "__u")
                .filter(
                    (F.col("__t") == step) & (F.col("__ts") > F.col(prev_col))
                )
                .groupBy("__u")
                .agg(F.min("__ts").alias(f"t{i}"))
            )
            out = out.join(cur, "__u", "left")
    # stage = deepest completed step: walk from the back, first non-null wins
    stage = F.coalesce(
        *[
            F.when(F.col(f"t{i}").isNotNull(), F.lit(i))
            for i in range(len(steps), 0, -1)
        ],
        F.lit(0),
    )
    return out.select(
        F.col("__u").alias(user_col),
        stage.alias("stage"),
        *[F.col(f"t{i}") for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the ``grain`` of their
    first-ever event (the cohort), counted once per (cohort, activity
    period) they return in. Returns (cohort, period, n_users).

    Scale shape: first-seen is one grouped min over the stream; the
    activity matrix is a distinct over (user, period) — both map-side
    combined on the user key — joined to the tiny per-user cohort frame
    and re-aggregated over the (cohort, period) grid, whose cardinality
    is weeks^2, not users.
    """
    cohorts = (
        events.groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__first"))
        .select("__u", F.date_trunc(grain, "__first").alias("cohort"))
    )
    active = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(grain, F.col(ts_col)).alias("period"),
    ).distinct()
    return (
        active.join(cohorts, "__u")
        .groupBy("cohort", "period")
        .agg(F.countDistinct("__u").alias("n_users"))
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = 2,
    dp: int = 6,
    max_basket_items: int | None = None,
    rank_by: str = "frequency",
) -> DataFrame:
    """Market-basket association rules over (basket, item) rows:
    (antecedent, consequent, co_count, support, confidence, lift),
    directed pairs, kept when co_count >= min_co.

    support = co/N, confidence = co/count(antecedent),
    lift = confidence / (count(consequent)/N) — each division written
    in that exact order so a SQL oracle reproduces the doubles, then
    rounded to ``dp``.

    ``max_basket_items`` caps the pair fan-out per basket at the
    standard Apriori working set: keep each basket's top-m items by
    GLOBAL frequency (ties to the lowest item id — deterministic, so
    an SQL oracle reproduces the cut exactly), enumerate pairs only
    among those. Pairs involving an item truncated from an oversized
    basket undercount by that basket — the documented, bounded
    approximation every large-scale basket miner makes; singleton
    marginals (support/confidence/lift denominators) stay EXACT,
    computed from the uncapped items. With the cap, pair-aggregate
    input is <= m*(m-1) rows per basket and the distinct-pair group
    space drops with the rare-pair tail — the r06 verdict's 6.6x
    100x-scale spot for the uncapped edge-sized aggregate.

    After the cap (order matters for output stability) items whose
    global count < min_co are pruned OUTPUT-INVARIANTLY: any pair they
    join has co_count <= count(item) < min_co and dies in the HAVING
    anyway — Apriori downward closure, purely a perf cut.

    ``rank_by`` picks the cap's ranking — and with it the plan shape:

    - ``"frequency"`` (default): the Apriori-standard working set.
      Needs the global item counts joined back per row + a per-basket
      window — three data-sized shuffles before pair enumeration.
    - ``"id"``: keep each basket's ``max_basket_items`` LOWEST item
      ids — ranking needs nothing global, so the whole miner collapses
      to the array formulation: ONE shuffle folds raw rows into
      per-basket item arrays (collect_set dedups in-aggregate — the
      separate distinct disappears), the cap is an array_sort+slice
      expression, pairs generate IN-ARRAY as UNDIRECTED x<y structs
      (half the pair volume of directed enumeration; co_count is
      symmetric so both directions re-emit from the tiny post-HAVING
      frame), and marginals explode from the same arrays. Two
      data-sized shuffles total, no join-back, no window. This is the
      scale path; the measured sf10 profile showed the frequency
      ranking's join+window chain costing more than the cap saved.

    Scale shape (both modes): pair fan-out bounded by
    ``max_basket_items`` (or basket size); the (ante, cons) aggregate
    is the intrinsic cost — on mostly-unique pairs map-side combine
    cannot shrink it, which is why halving enumeration via undirected
    pairs matters. Per-basket state in the array path is one item
    array (the market-basket boundedness assumption, documented).
    No driver actions.
    """
    if rank_by not in ("frequency", "id"):
        raise ValueError(f"rank_by must be 'frequency' or 'id', got {rank_by!r}")
    if rank_by == "id":
        if max_basket_items is None:
            raise ValueError("rank_by='id' requires max_basket_items")
        return _association_rules_arrays(
            baskets, basket_col, item_col, min_co, dp, max_basket_items
        )
    items = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    nb = items.agg(F.countDistinct("__b").alias("__nb"))
    item_cnt = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__cnt"))
    pair_src = items
    if max_basket_items is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("__b").orderBy(
            F.col("__cnt").desc(), F.col("__i")
        )
        pair_src = (
            items.join(item_cnt, "__i")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_basket_items)
            .select("__b", "__i")
        )
    # downward-closure prune (exact): item count < min_co can't reach
    # co_count >= min_co
    frequent = item_cnt.filter(F.col("__cnt") >= min_co).select("__i")
    pair_src = pair_src.join(frequent, "__i").select("__b", "__i")
    a = pair_src.alias("a")
    b = pair_src.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__i") != F.col("b.__i")),
        )
        .groupBy(
            F.col("a.__i").alias("antecedent"),
            F.col("b.__i").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("co_count"))
        .filter(F.col("co_count") >= min_co)
    )
    ca = item_cnt.select(
        F.col("__i").alias("antecedent"), F.col("__cnt").alias("__ca")
    )
    cb = item_cnt.select(
        F.col("__i").alias("consequent"), F.col("__cnt").alias("__cb")
    )
    conf = F.col("co_count") / F.col("__ca")
    # ca/cb are ITEM-sized (catalog-scale: millions at 100x) — never
    # force-broadcast them; the q3 lesson (session.py) is that a
    # "small" frame that scales with the data is a fact in disguise.
    # Plain equi-joins let AQE broadcast them only while they fit.
    return (
        co.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "co_count",
            F.round(F.col("co_count") / F.col("__nb"), dp).alias("support"),
            F.round(conf, dp).alias("confidence"),
            F.round(conf / (F.col("__cb") / F.col("__nb")), dp).alias("lift"),
        )
    )


def _association_rules_arrays(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int,
    dp: int,
    max_basket_items: int,
) -> DataFrame:
    """rank_by='id' plan of :func:`association_rules` (see its
    docstring): basket arrays -> in-array undirected pair explode ->
    pair aggregate; marginals from the same arrays."""
    arrs = (
        baskets.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .groupBy("__b")
        .agg(F.collect_set("__i").alias("__arr"))
    )
    nb = arrs.agg(F.count(F.lit(1)).alias("__nb"))
    item_cnt = (
        arrs.select(F.explode("__arr").alias("__i"))
        .groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    capped = F.slice(F.array_sort("__arr"), 1, max_basket_items)
    pair_structs = F.flatten(
        F.transform(
            capped,
            lambda x: F.transform(
                F.filter(capped, lambda y: y > x),
                lambda y: F.struct(x.alias("lo"), y.alias("hi")),
            ),
        )
    )
    co_u = (
        arrs.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.lo").alias("lo"), F.col("p.hi").alias("hi"))
        .agg(F.count(F.lit(1)).alias("co_count"))
        .filter(F.col("co_count") >= min_co)
    )
    # co_count is symmetric: re-emit both directions from the tiny
    # post-HAVING frame
    co = co_u.select(
        F.col("lo").alias("antecedent"),
        F.col("hi").alias("consequent"),
        "co_count",
    ).unionByName(
        co_u.select(
            F.col("hi").alias("antecedent"),
            F.col("lo").alias("consequent"),
            "co_count",
        )
    )
    ca = item_cnt.select(
        F.col("__i").alias("antecedent"), F.col("__cnt").alias("__ca")
    )
    cb = item_cnt.select(
        F.col("__i").alias("consequent"), F.col("__cnt").alias("__cb")
    )
    conf = F.col("co_count") / F.col("__ca")
    return (
        co.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "co_count",
            F.round(F.col("co_count") / F.col("__nb"), dp).alias("support"),
            F.round(conf, dp).alias("confidence"),
            F.round(conf / (F.col("__cb") / F.col("__nb")), dp).alias("lift"),
        )
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    dp: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    (prev_type, next_type, n, prob) where prob is row-normalized over
    each prev_type. Transitions are counted within a user's stream,
    ordered by (ts, tiebreak) for determinism.

    Scale shape: one lag window partitioned by user (one shuffle on the
    user key), one (prev, next) aggregate over the |types|^2 grid, and
    a broadcast join of the per-prev totals — the matrix is
    vocabulary-sized, never event-sized.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("__tot"), dp).alias("prob"),
        )
    )


def last_touch_attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    lookback_sec: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch marketing attribution: every conversion event is
    credited to the user's most recent touch event STRICTLY before it
    and within ``lookback_sec`` (ties at the same timestamp break by
    the larger event id — fully deterministic); conversions with no
    in-window touch surface with NULL touch columns, never dropped.

    Plan — the repo's as-of/LOCF idiom, NOT a conv x touch join: a
    per-user equi-join enumerates every (conversion, touch) pair
    BEFORE the lookback band filters, so a hot user (a bot with 10^5
    events) pays quadratic pair evaluation. Instead touches and
    conversions union into one stream, one (user, ts) sort orders
    them with conversions BEFORE same-timestamp touches (enforcing
    the STRICTLY-before rule positionally), and ``last(touch,
    ignorenulls)`` carries the latest touch forward — the lookback
    check lands on the carried epoch. One user-keyed window, zero
    pair enumeration; the shuffle is the standard sessionization
    cost."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    base = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
        sec.alias("es"),
    )
    from pyspark.sql import Window

    # one stream: kind 0 = conversion, 1 = touch. Ordering (es, kind,
    # eid) puts a conversion BEFORE touches at its own timestamp
    # (strictly-before rule) and orders same-es touches by ascending
    # id, so the LAST carried touch is the max-(es, id) eligible one
    # — exactly the old argmax's (touch_s DESC, touch_id DESC) winner.
    # An event type that is BOTH a conversion and a touch emits TWO
    # rows (a kind-0 row with a NULL touch struct and a kind-1 touch
    # row): folding them into one kind-0 row would let a conversion
    # carry its own — or a same-timestamp sibling conversion's —
    # touch struct, breaking the strictly-before rule at lag 0.
    conv_rows = base.where(F.col("etype") == conversion_type).select(
        "u",
        "eid",
        "es",
        F.lit(0).alias("__kind"),
        F.lit(None)
        .cast("struct<ts:long,tid:long,ttype:string>")
        .alias("__touch"),
    )
    touch_rows = base.where(F.col("etype").isin(*touch_types)).select(
        "u",
        "eid",
        "es",
        F.lit(1).alias("__kind"),
        F.struct(
            F.col("es").alias("ts"),
            F.col("eid").alias("tid"),
            F.col("etype").alias("ttype"),
        ).alias("__touch"),
    )
    ev = conv_rows.unionByName(touch_rows)
    w = (
        Window.partitionBy("u")
        .orderBy("es", "__kind", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "u",
        "eid",
        "es",
        "__kind",
        F.last("__touch", ignorenulls=True).over(w).alias("__lt"),
    )
    in_window = F.col("__lt").isNotNull() & (
        F.col("__lt.ts") >= F.col("es") - F.lit(lookback_sec)
    )
    return carried.where(F.col("__kind") == 0).select(
        F.col("eid").alias("conversion_id"),
        F.col("u").alias(user_col),
        F.col("es").alias("conversion_epoch"),
        F.when(in_window, F.col("__lt.ttype")).alias("touch_type"),
        F.when(in_window, F.col("__lt.ts")).alias("touch_epoch"),
        F.when(in_window, F.col("es") - F.col("__lt.ts")).alias(
            "touch_lag_sec"
        ),
    )
