"""Pareto frontier (skyline) over two criteria, distributed.

The 2-D skyline — points not dominated by any other point (another
point at-least-as-good in both dimensions, strictly better in one) —
reduces to a prefix minimum after sorting: with x to MAXIMIZE and y to
MINIMIZE, a point survives iff its y is strictly below the minimum y of
every strictly-higher-x point. A naive implementation is the
textbook "sort globally, run a cursor" — a single-task bottleneck at
100 TB. This module does the distributed version:

1. per-x reduce: only the min-y per distinct x can survive (equal x,
   higher y is dominated) — one hash shuffle, map-side combined.
2. range-bucket the x axis into B buckets on equal-frequency quantile
   edges from a broadcast 1-row census (operators/bucketing.py); each
   bucket computes its LOCAL prefix-min in parallel (window
   partitioned by bucket, ordered x desc).
3. the per-bucket y minima — B rows, KBs — are window-scanned into a
   per-bucket "best y of all higher-x buckets" offset and broadcast
   back; global prefix-min = min(local prefix, higher-bucket offset).

Total: one shuffle + one bucket-partitioned window + a broadcast of B
rows. No global sort, no single-task scan; equivalent to the
one-partition formulation by associativity of min (pytest-proved).

Reference has no skyline; this is a standard OLAP operator (Börzsönyi
et al., "The Skyline Operator", ICDE 2001) expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockpy_spark.operators.bucketing import freq_edges, with_freq_bucket
from stockpy_spark.operators.pinning import pin, pin_literal


def pareto_frontier_2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Distinct non-dominated (``max_col``, ``min_col``) points:
    maximize the first, minimize the second. Returns the two columns,
    one row per surviving point.

    ``n_buckets`` trades parallelism against the (tiny) bucket-census
    pass; any value yields the same result.
    """
    # eager checkpoint (r12, the ks_2samp precedent in drift.py): the
    # per-x reduce collapses the fact to distinct x values and feeds
    # three branches (edges census, local prefix-min, bucket census)
    pts = (
        df.groupBy(max_col)
        .agg(F.min(min_col).alias(min_col))
        .transform(pin)
    )
    # bucket 0 holds the LARGEST x so bucket order matches scan order;
    # edges are EQUAL-FREQUENCY quantiles over the distinct x values
    # (operators/bucketing.py) — the r11 verdict: equal-width (min,
    # max) edges collapse under one outlier x, funnelling every point
    # into one bucket's prefix-min window. Still a 1-row broadcast
    # census; output-invariant (any bucketing yields the same
    # frontier, as documented above).
    # eager checkpoint: the bucketing.py determinism rule —
    # percentile_approx varies per materialization and this census
    # feeds both the local prefix-min and offset branches
    # r17: one row by construction — literal-pin (pin_literal) so the
    # edges embed in the plan; same determinism, one less job + scan.
    bounds = pts.agg(
        freq_edges(max_col, n_buckets).alias("__edges")
    ).transform(lambda d: pin_literal(d, 1))
    bucketed = with_freq_bucket(
        pts.crossJoin(F.broadcast(bounds)),
        F.col(max_col),
        F.col("__edges"),
        n_buckets,
        "__b",
        descending=True,
    ).select(max_col, min_col, "__b")
    w_local = (
        Window.partitionBy("__b")
        .orderBy(F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("__local_pm", F.min(min_col).over(w_local))
    # B-row census: best y per bucket, then best y of all HIGHER-x
    # (lower-index) buckets — a window over B rows, broadcast back
    census = bucketed.groupBy("__b").agg(F.min(min_col).alias("__bmin"))
    w_prefix = (
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = census.select(
        "__b", F.min("__bmin").over(w_prefix).alias("__prev_pm")
    )
    joined = local.join(F.broadcast(offsets), "__b")
    global_pm = F.least(
        F.coalesce(F.col("__local_pm"), F.col("__prev_pm")),
        F.coalesce(F.col("__prev_pm"), F.col("__local_pm")),
    )
    return (
        joined.filter(global_pm.isNull() | (F.col(min_col) < global_pm))
        .select(max_col, min_col)
    )
