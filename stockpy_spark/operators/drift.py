"""Distribution-drift detection: PSI and the two-sample KS statistic.

A training-data pipeline re-ingests the "same" feed continuously; the
failure mode that quietly poisons a model is not a broken schema (the
DQ suite in operators/quality.py catches that) but a SHIFTED
distribution — a source changes units, a scraper starts hitting a
different population, a filter upstream flips. The two standard
screens, both computed here as exact distributed aggregations:

* **PSI** (population stability index, the credit-scoring industry
  standard): bin the reference distribution into equal-width bins,
  compare bin mass against the current batch,
  PSI = sum_b (p_b - q_b) * ln(p_b / q_b). Rule of thumb: < 0.1 stable,
  0.1-0.25 moderate, > 0.25 action.
* **Kolmogorov-Smirnov D**: the sup-norm distance between the two
  empirical CDFs, D = max_v |F_ref(v) - F_cur(v)| — nonparametric, no
  binning choice to get wrong.

Scale shapes: PSI is one broadcast min/max census + one groupBy over
each side (bin id arithmetic is narrow) + a bins-sized window. The KS
ECDF needs a GLOBAL cumulative sum — the textbook single-sort
formulation is a one-task bottleneck at 100 TB, so it reuses the
bucketed prefix-aggregate pattern of operators/skyline.py: range-bucket
the value axis from a broadcast census, cumulative-sum WITHIN each
bucket in parallel, then close the buckets with a B-row broadcast
offset table. One shuffle on the distinct-value reduce, one on the
bucket window; the only unpartitioned window runs over B rows.

Float determinism: every per-row quantity (bin ids, ECDF fractions,
their differences) is built from bigint counts via single double
divisions — bit-identical on any IEEE engine — so even the float
equality in the arg-max tie-break replays exactly on the SQL oracle.
Only the final PSI sum (a bins-sized reduction) is rounded.

The reference has no drift tooling; its closest guard is the empty-
frame check (scripts/transform_stocks_job.py:63-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from stockpy_spark.operators.pinning import pin, pin_literal

EPS = 1e-6  # standard PSI zero-bin floor


def population_stability_index(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    dp: int = 6,
) -> DataFrame:
    """Equal-width PSI of ``cur`` against ``ref`` over ``value_col``.

    Bin edges come from the REFERENCE min/max (a 1-row broadcast
    census); current-batch values outside the reference range clamp
    into the edge bins (the standard treatment — mass appearing
    outside the trained range IS drift and must be counted, not
    dropped). Zero-mass bins are floored at ``EPS`` before the log so
    PSI stays finite.

    Returns one row per bin: (bin, n_ref, n_cur, p_ref, p_cur,
    psi_term, psi) with fractions and terms rounded to ``dp`` and
    ``psi`` (the bin-sum, the headline number) repeated on every row —
    same layout as quality.benford_first_digit. NULL values are
    excluded from both sides.
    """
    v = F.col(value_col)
    census = ref.filter(v.isNotNull()).agg(
        F.min(v).alias("mn"), F.max(v).alias("mx")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        width = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
        # constant reference (mx == mn): zero width would NaN the whole
        # grid; the point mass is bin 0 and current values ABOVE it
        # clamp to the top bin (the same out-of-range treatment as a
        # normal grid's edges)
        b = F.when(
            F.col("mx") == F.col("mn"),
            F.when(v <= F.col("mn"), F.lit(0)).otherwise(F.lit(n_bins - 1)),
        ).otherwise(F.floor((v - F.col("mn")) / width).cast("int"))
        return (
            df.filter(v.isNotNull())
            .crossJoin(F.broadcast(census))
            .select(
                F.least(
                    F.lit(n_bins - 1), F.greatest(F.lit(0), b)
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    r, c = binned(ref, "n_ref"), binned(cur, "n_cur")
    grid = r.join(c, "bin", "full").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    w = Window.partitionBy()
    # try_divide + explicit null propagation (r11 degenerate sweep):
    # an EMPTY side has zero total mass, and its fractions — hence
    # PSI — are undefined; a plain / raises ANSI DIVIDE_BY_ZERO, and
    # greatest() alone would SKIP the null and floor every bin at EPS,
    # fabricating a huge drift score out of no data.
    p_raw = F.try_divide(F.col("n_ref"), F.sum("n_ref").over(w))
    q_raw = F.try_divide(F.col("n_cur"), F.sum("n_cur").over(w))
    p = F.when(p_raw.isNotNull(), F.greatest(p_raw, F.lit(EPS)))
    q = F.when(q_raw.isNotNull(), F.greatest(q_raw, F.lit(EPS)))
    term = (p - q) * F.log(p / q)
    return (
        grid.withColumn("p_ref", F.round(p, dp))
        .withColumn("p_cur", F.round(q, dp))
        .withColumn("psi_term", F.round(term, dp))
        .withColumn("psi", F.round(F.sum(term).over(w), dp))
        .select("bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term", "psi")
    )


def ks_2samp(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_buckets: int = 64,
    dp: int = 6,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic, distributed.

    Returns ONE row: (n_ref, n_cur, d_stat, at_value) where ``d_stat``
    is max_v |F_ref(v) - F_cur(v)| over the pooled distinct values
    (ECDFs are right-continuous, so the sup over all reals is attained
    at sample points) and ``at_value`` is the smallest value attaining
    it. NULLs excluded.

    The global running counts use the skyline bucketing trick instead
    of one giant ordered window: distinct values are range-bucketed,
    each bucket cumulative-sums its own values in parallel, and
    per-bucket totals — B rows — are prefix-summed in a single tiny
    task and broadcast back as offsets. Equivalent to the global sort
    by associativity of +. Bucket edges are EQUAL-FREQUENCY quantiles
    from a ``percentile_approx`` census (operators/bucketing.py) —
    the r11 verdict found the previous equal-width (min, max) edges
    collapse under ONE outlier value (everything floors into bucket 0
    and the window degenerates to a single-task sort); quantile edges
    keep ~1/B of the distinct values per bucket regardless of tails.
    The census stays the same 1-row broadcast crossJoin, so the fix
    costs no extra pass.
    """
    from stockpy_spark.operators.bucketing import (
        freq_edges,
        with_freq_bucket,
    )
    pooled = (
        ref.select(F.col(value_col).alias("v"), F.lit(1).alias("is_ref"))
        .unionAll(
            cur.select(F.col(value_col).alias("v"), F.lit(0).alias("is_ref"))
        )
        .filter(F.col("v").isNotNull())
    )
    # eager checkpoint (r12 measured, the r11 dominance criterion):
    # this distinct-value aggregate collapses the pooled fact (10M
    # rows -> 13k values at the sf10 spot) and is consumed by THREE
    # branches (edges census, local cumsum, bucket offsets), each
    # planned as its own union-scan + agg — pinning it took the sf10
    # spot from 6.17 s to 3.87 s with identical output. Worst case
    # (continuous column, distinct ~ rows) it still trades two full
    # recomputes for one distinct-sized materialization.
    per_v = pooled.groupBy("v").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("c_cur"),
    ).transform(pin)
    # eager checkpoint pins the SKETCHED edges — the bucketing.py
    # determinism rule: percentile_approx varies per materialization
    # and this census feeds both the local-cumsum and offset branches
    # r17: one row by construction — literal-pin (pin_literal) so the
    # edges/totals embed in the plan; same determinism, one less job.
    census = per_v.agg(
        freq_edges("v", n_buckets).alias("edges"),
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
    ).transform(lambda d: pin_literal(d, 1))
    bucketed = with_freq_bucket(
        per_v.crossJoin(F.broadcast(census)),
        F.col("v"),
        F.col("edges"),
        n_buckets,
        "bkt",
    )
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(
        "l_ref", F.sum("c_ref").over(wloc)
    ).withColumn("l_cur", F.sum("c_cur").over(wloc))
    # B-row bucket totals -> exclusive running offsets (tiny task)
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.sum("c_ref").alias("t_ref"), F.sum("c_cur").alias("t_cur"))
        .select(
            "bkt",
            (F.sum("t_ref").over(woff) - F.col("t_ref")).alias("o_ref"),
            (F.sum("t_cur").over(woff) - F.col("t_cur")).alias("o_cur"),
        )
    )
    ecdf = local.join(F.broadcast(offsets), "bkt").withColumn(
        "d",
        F.abs(
            F.try_divide(F.col("l_ref") + F.col("o_ref"), F.col("n_ref"))
            - F.try_divide(F.col("l_cur") + F.col("o_cur"), F.col("n_cur"))
        ),
    )
    # sup + arg-sup as a top-1: per-partition heaps
    # (TakeOrderedAndProject), no second pass over the ECDF and no
    # 1-row cross join. Ties on d resolve to the smallest value,
    # matching the oracle's min-over-argmax.
    return (
        ecdf.select("v", "d", "n_ref", "n_cur")
        .orderBy(F.col("d").desc(), F.col("v").asc())
        .limit(1)
        .select(
            "n_ref",
            "n_cur",
            F.round("d", dp).alias("d_stat"),
            F.col("v").alias("at_value"),
        )
    )


def psi_series(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    period_seconds: int = 604_800,
    n_bins: int = 10,
    alert: float = 0.2,
    dp: int = 6,
) -> DataFrame:
    """PSI drift MONITORING — the time-series shape the pairwise ops
    lack: :func:`population_stability_index` answers "did batch B
    drift from batch A", a production monitor needs "which WEEK did
    the metric start drifting and is it still drifting". Buckets rows
    into fixed ``period_seconds`` windows (integral epoch math, no
    calendar ambiguity), takes the EARLIEST period as the reference
    distribution, and reports every period's PSI against it — the
    reference period itself reads 0.0, the built-in sanity row.

    Same statistical treatment as the pairwise op: equal-width bins
    from the reference min/max, out-of-range mass clamps into edge
    bins (drift must be counted, not dropped), EPS floor before the
    log, standard 0.2 alert threshold. Returns one row per period:
    (period, n_values, psi, is_alert).

    Scale shape: one (period, bin) count aggregate of the fact stream
    (map-side combined — output is periods x bins, KB), a dense
    periods-x-bins grid built by exploding a bin sequence over the
    periods frame (zero-count bins must exist: missing mass IS
    drift), and two 1-row censuses (reference period id, reference
    range). Nothing data-sized past the first aggregate; the PSI
    windows run over the KB grid.
    """
    v, ts = F.col(value_col), F.col(ts_col)
    base = df.filter(v.isNotNull() & ts.isNotNull()).select(
        F.floor(
            ts.cast("timestamp").cast("long") / F.lit(period_seconds)
        ).cast("long").alias("period"),
        v.alias("__v"),
    )
    refp = base.agg(F.min("period").alias("__refp"))
    rng = (
        base.crossJoin(F.broadcast(refp))
        .filter(F.col("period") == F.col("__refp"))
        .agg(F.min("__v").alias("mn"), F.max("__v").alias("mx"))
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
    b_raw = F.when(
        F.col("mx") == F.col("mn"),
        F.when(F.col("__v") <= F.col("mn"), F.lit(0)).otherwise(
            F.lit(n_bins - 1)
        ),
    ).otherwise(F.floor((F.col("__v") - F.col("mn")) / width).cast("int"))
    counts = (
        base.crossJoin(F.broadcast(rng))
        .select(
            "period",
            F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b_raw)).alias("bin"),
        )
        .groupBy("period", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    periods = counts.select("period").distinct()
    grid = (
        periods.select(
            "period", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
        )
        .join(counts, ["period", "bin"], "left")
        .select("period", "bin", F.coalesce("n", F.lit(0)).alias("n_cur"))
    )
    ref_bins = (
        grid.crossJoin(F.broadcast(refp))
        .filter(F.col("period") == F.col("__refp"))
        .select("bin", F.col("n_cur").alias("n_ref"))
    )
    joined = grid.join(F.broadcast(ref_bins), "bin")
    wp = Window.partitionBy("period")
    p_raw = F.try_divide(
        F.col("n_ref"), F.sum("n_ref").over(Window.partitionBy("period"))
    )
    q_raw = F.try_divide(F.col("n_cur"), F.sum("n_cur").over(wp))
    p = F.when(p_raw.isNotNull(), F.greatest(p_raw, F.lit(EPS)))
    q = F.when(q_raw.isNotNull(), F.greatest(q_raw, F.lit(EPS)))
    term = (p - q) * F.log(p / q)
    psi = F.round(F.sum(term).over(wp), dp)
    return (
        joined.withColumn("__psi", psi)
        .groupBy("period")
        .agg(
            F.sum("n_cur").cast("bigint").alias("n_values"),
            F.max("__psi").alias("psi"),
            (F.max("__psi") > F.lit(float(alert))).alias("is_alert"),
        )
    )
