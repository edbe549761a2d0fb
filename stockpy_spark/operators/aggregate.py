"""Aggregation-family operators (SURVEY.md §2.4 A1-A5 + same-family
extensions: count-distinct, rollup/cube/pivot).

All of these plan as partial (map-side) + final HashAggregate — the
partial combine is what keeps the shuffle small at 100 TB. ``group_summary``
takes aggregate Columns, so any builtin (sum/avg/min/max/stddev/
approx_count_distinct/percentile_approx) rides the same operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_summary(df: DataFrame, keys: list[str], aggs: dict[str, F.Column]) -> DataFrame:
    """A1 — grouped hash aggregate (reference: per-sector avg(close) +
    sum(volume), transform_stocks_job.py:177-180). ``aggs`` maps output
    name -> aggregate Column; aliasing here keeps Spark/oracle column
    names in lockstep."""
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A3 — exact full-row (or projected) distinct (reference:
    dropDuplicates(), transform_news_job.py:121)."""
    return (df.select(*subset) if subset else df).distinct()


def dedup_by_key_any(df: DataFrame, keys: list[str]) -> DataFrame:
    """A4, reference semantics — one row per key, arbitrary survivor
    (reference: dropDuplicates(["link"]), transform_news_job.py:124).
    Nondeterministic across runs/partitionings; prefer
    :func:`dedup_by_key_first` in pipelines."""
    return df.dropDuplicates(keys)


def dedup_by_key_first(
    df: DataFrame, keys: list[str], order_by: list, descending: bool = False
) -> DataFrame:
    """A4, deterministic variant — one row per key, survivor = first by
    ``order_by`` (row_number()=1). ``order_by`` must be a total order
    within each key for full determinism."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if descending:
        cols = [c.desc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rollup_summary(df: DataFrame, keys: list[str], aggs: dict[str, F.Column]) -> DataFrame:
    """Hierarchical subtotals (GROUP BY ROLLUP)."""
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def cube_summary(df: DataFrame, keys: list[str], aggs: dict[str, F.Column]) -> DataFrame:
    """All grouping-set combinations (GROUP BY CUBE)."""
    return df.cube(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def grouping_sets_summary(
    df: DataFrame,
    sets: list[list[str]],
    all_keys: list[str],
    agg_exprs: dict[str, str],
) -> DataFrame:
    """Explicit GROUP BY GROUPING SETS (rollup/cube are special cases).
    Uses the SQL form — the DataFrame API has no direct grouping-sets
    entry point; Catalyst plans an Expand + single aggregate either way.
    ``agg_exprs`` maps output name -> aggregate SQL expression string."""
    spark = df.sparkSession
    view = f"__gs_{abs(hash(tuple(all_keys))) % 10**8}"
    df.createOrReplaceTempView(view)
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    agg_sql = ", ".join(f"{expr} AS {n}" for n, expr in agg_exprs.items())
    return spark.sql(
        f"SELECT {', '.join(all_keys)}, {agg_sql} FROM {view} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def unpivot_measures(
    df: DataFrame,
    ids: list[str],
    measures: list[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long (melt): one row per (id, measure). Plans as Expand —
    a single pass, no shuffle."""
    return df.unpivot(ids, measures, var_name, value_name)


def pivot_summary(
    df: DataFrame, keys: list[str], pivot_col: str, pivot_values: list[str], agg: F.Column
) -> DataFrame:
    """Pivot with explicit value list (explicit values avoid the extra
    distinct-values job AND keep output schema static — mandatory at
    scale)."""
    return df.groupBy(*keys).pivot(pivot_col, pivot_values).agg(agg)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_nonnull, n_nulls,
    n_distinct) per requested column — the data-quality summary every
    ingestion run should log before a table goes live.

    Single aggregation over the frame (the multi-column distinct counts
    fuse into one Expand pass, map-side partially aggregated), then an
    unpivot to long form — no per-column rescans, so profiling a
    100-column 100 TB table costs one read. Distinct counts are EXACT
    here (the verify-tier contract a small profile run wants); swap
    `approx_count_distinct` in at interactive scale — the sketches
    module (gate_hll_rollup) pins that estimator's error contract.
    """
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__d_{c}"))
    row = df.agg(*aggs)
    profiles = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__d_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*profiles)).alias("p")).select(
        "p.column", "p.n_rows", "p.n_nonnull", "p.n_nulls", "p.n_distinct"
    )


def top_movers(
    df: DataFrame,
    key_col: str,
    period_col,
    period_a,
    period_b,
    metric_col: str,
    k: int = 20,
    dp: int = 6,
) -> DataFrame:
    """Period-over-period change ranking: sum ``metric_col`` per key in
    two periods, rank keys by absolute delta — the "what moved and by
    how much" report behind every metrics review.

    ``period_col`` is a Column expression (e.g. year(o_orderdate));
    keys absent from a period contribute 0 there (a key collapsing to
    zero IS a top mover — an inner join would hide exactly the
    interesting rows). Returns the top ``k`` rows (key, metric_a,
    metric_b, delta, rank) by (|delta| desc, key asc).

    One filtered scan feeds a single conditional aggregate (no
    self-join of two period subqueries), then top-k via per-partition
    heaps. At 100 TB this is one shuffle on the key.
    """
    from pyspark.sql.window import Window

    base = df.filter(period_col.isin([period_a, period_b])).select(
        F.col(key_col).alias("key"),
        period_col.alias("__p"),
        F.col(metric_col).cast("double").alias("__m"),
    )
    per = base.groupBy("key").agg(
        F.round(
            F.sum(F.when(F.col("__p") == period_a, F.col("__m")).otherwise(0.0)),
            dp,
        ).alias("metric_a"),
        F.round(
            F.sum(F.when(F.col("__p") == period_b, F.col("__m")).otherwise(0.0)),
            dp,
        ).alias("metric_b"),
    )
    delta = F.round(F.col("metric_b") - F.col("metric_a"), dp)
    top = (
        per.withColumn("delta", delta)
        .orderBy(F.abs(F.col("delta")).desc(), F.col("key"))
        .limit(k)
    )
    w = Window.orderBy(F.abs(F.col("delta")).desc(), F.col("key"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "key", "metric_a", "metric_b", "delta", "rank"
    )


def price_volume_decomposition(
    df: DataFrame,
    dim_col: str,
    period_col,
    period_a,
    period_b,
    qty_col: str,
    revenue_col: str,
    dp: int = 6,
) -> DataFrame:
    """Period-over-period revenue-change decomposition per dimension
    value — the "why did revenue move" report: for each segment,
    delta = volume_effect + price_effect with

        volume_effect = (q1 - q0) * p0      (more/fewer units at the
                                             old average price)
        price_effect  = q1 * (p1 - p0)      (new units at the price
                                             change)

    where p = revenue / quantity per period. The identity is exact
    (v + p = q1*p1 - q0*p0 = delta), so the output self-reconciles.
    Segments present in only one period get the whole delta as
    volume_effect (there is no old/new price to compare against —
    reported, not NaN-ed).

    One conditional aggregate over a period-filtered scan (no
    two-subquery self-join), one shuffle on the dimension.
    Returns (dim, qty_a, qty_b, rev_a, rev_b, delta, volume_effect,
    price_effect); money-magnitude outputs round to cents, the
    stats.gini_by_group precision rule.
    """
    in_a = F.col("__p") == F.lit(period_a)
    base = df.filter(period_col.isin([period_a, period_b])).select(
        F.col(dim_col).alias("dim"),
        period_col.alias("__p"),
        F.col(qty_col).cast("double").alias("__q"),
        F.col(revenue_col).cast("double").alias("__r"),
    )
    per = base.groupBy("dim").agg(
        F.sum(F.when(in_a, F.col("__q")).otherwise(0.0)).alias("q0"),
        F.sum(F.when(~in_a, F.col("__q")).otherwise(0.0)).alias("q1"),
        F.sum(F.when(in_a, F.col("__r")).otherwise(0.0)).alias("r0"),
        F.sum(F.when(~in_a, F.col("__r")).otherwise(0.0)).alias("r1"),
    )
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    delta = F.col("r1") - F.col("r0")
    both = (F.col("q0") > 0) & (F.col("q1") > 0)
    vol = F.when(both, (F.col("q1") - F.col("q0")) * p0).otherwise(delta)
    prc = F.when(both, F.col("q1") * (p1 - p0)).otherwise(F.lit(0.0))
    return per.select(
        "dim",
        F.round("q0", 2).alias("qty_a"),
        F.round("q1", 2).alias("qty_b"),
        F.round("r0", 2).alias("rev_a"),
        F.round("r1", 2).alias("rev_b"),
        F.round(delta, 2).alias("delta"),
        F.round(vol, 2).alias("volume_effect"),
        F.round(prc, 2).alias("price_effect"),
    )
