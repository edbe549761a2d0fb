"""Range (interval) joins, Spark-first.

A naive ``facts JOIN intervals ON value BETWEEN lo AND hi`` has no equi
key, so Catalyst can only plan a BroadcastNestedLoopJoin — O(|facts| x
|intervals|) compares and a broadcast that must hold the whole interval
side. Fine for a handful of bands, fatal at 100 TB.

The scale path here is the classic *bucketed range join* (the same
decomposition Databricks' range-join optimization and PostGIS grid joins
use): pick a bucket width, explode every interval into the buckets it
overlaps (``sequence(floor(lo/w), floor(hi/w))``), map every fact value
to its single bucket (``floor(v/w)``), equi-join on bucket (plus any
extra equi keys), then re-check the exact predicate. Each matching pair
is produced exactly once — a fact lives in exactly one bucket — so no
dedup pass is needed. The join is a plain shuffled (or broadcast, if the
exploded interval side is small) hash equi-join: partitionable, AQE-
skew-splittable, no nested loop.

Choosing ``bucket_width`` ~ the typical interval length keeps the
explode factor ~2 rows per interval; a width 10x too small costs 10x
interval rows (cheap, they're narrow), a width 10x too big costs up to
10x false bucket-mates filtered after the join (cheap, it's a post-join
filter inside the same stage). Either direction degrades linearly,
never quadratically.

Reference parity: the reference has no range operator (its joins are all
equi — transform_stocks_job.py:149-170); this is part of the
training-data-pipeline extension surface (price banding, event-in-window
attribution, time-interval overlap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def choose_bucket_width(
    intervals: DataFrame, lo_col: str, hi_col: str, sample_rows: int = 100_000
) -> float:
    """Pick a bucket width ~ the median interval length.

    A 100 TB user with an unknown interval-length distribution will
    guess the width wrong; the docstring's linear degradation still
    costs real money at scale. This samples up to ``sample_rows``
    intervals (bounded driver cost regardless of table size) and takes
    the approx-median of ``hi - lo`` — the width that keeps the explode
    factor ~2 rows per interval for the typical interval. Degenerate
    cases (empty frame, all point intervals) fall back to 1.0. The
    returned width affects ONLY performance, never results, so the
    sample being arbitrary is fine.
    """
    row = (
        intervals.where(F.col(hi_col) >= F.col(lo_col))
        .select(
            (F.col(hi_col).cast("double") - F.col(lo_col).cast("double")).alias(
                "__len"
            )
        )
        .limit(sample_rows)
        .agg(F.percentile_approx("__len", F.lit(0.5), F.lit(1000)).alias("m"))
        .first()
    )
    m = row["m"] if row is not None else None
    if m is None or m <= 0:
        return 1.0
    return float(m)


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join ``facts`` to every interval row whose closed
    ``[lo, hi]`` contains ``facts[value_col]``, as an equi-join on
    coarse buckets.

    ``bucket_width=None`` (default) auto-picks the width from a bounded
    sample of interval lengths (see :func:`choose_bucket_width`).

    ``extra_keys``: additional equality keys joined alongside the bucket
    (e.g. a tenant/user id) — they shrink bucket collision groups and
    make the shuffle key compound, which is what you want at scale. The
    joined frame keeps one copy of each extra key (the fact side's).
    Intervals with ``hi < lo`` produce no matches. Inner-only: outer
    variants need a separate left-anti fill-in pass, which would break
    the exactly-once-per-pair guarantee this construction gives for
    free.
    """
    extra_keys = extra_keys or []
    if bucket_width is None:
        bucket_width = choose_bucket_width(intervals, lo_col, hi_col)
    iv = (
        intervals.where(F.col(hi_col) >= F.col(lo_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    _bucket(F.col(lo_col), bucket_width),
                    _bucket(F.col(hi_col), bucket_width),
                )
            ),
        )
        .alias("__iv")
    )
    fc = facts.withColumn(
        "__bucket", _bucket(F.col(value_col), bucket_width)
    ).alias("__fc")
    cond = F.col("__fc.__bucket") == F.col("__iv.__bucket")
    for k in extra_keys:
        cond = cond & (F.col(f"__fc.{k}") == F.col(f"__iv.{k}"))
    # Qualify the exact-predicate columns: facts and intervals may share
    # column names outside extra_keys, and unqualified refs would be
    # ambiguous then.
    val = F.col(f"__fc.{value_col}")
    out = fc.join(iv, cond, "inner").where(
        (val >= F.col(f"__iv.{lo_col}")) & (val <= F.col(f"__iv.{hi_col}"))
    )
    out = out.drop(F.col("__fc.__bucket")).drop(F.col("__iv.__bucket"))
    for k in extra_keys:
        out = out.drop(F.col(f"__iv.{k}"))
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Interval-x-interval overlap join (``l.lo <= r.hi AND r.lo <=
    l.hi``, closed intervals) via the same bucket decomposition.

    ``bucket_width=None`` (default) auto-picks the width from a bounded
    sample of BOTH sides' interval lengths.

    Both sides explode into covered buckets; an overlapping pair can
    meet in several shared buckets, so matches are kept only in the
    FIRST shared bucket (``max(floor(l.lo/w), floor(r.lo/w))``) — the
    standard trick that restores exactly-once without a distinct pass
    (every overlapping pair shares that bucket: the later-starting
    interval's first bucket is covered by both).
    """
    extra_keys = extra_keys or []
    if bucket_width is None:
        lens = left.select(
            F.col(left_lo).alias("lo"), F.col(left_hi).alias("hi")
        ).union(
            right.select(F.col(right_lo).alias("lo"), F.col(right_hi).alias("hi"))
        )
        bucket_width = choose_bucket_width(lens, "lo", "hi")

    def explode_side(df: DataFrame, lo: str, hi: str, name: str) -> DataFrame:
        return (
            df.where(F.col(hi) >= F.col(lo))
            .withColumn(
                "__bucket",
                F.explode(
                    F.sequence(
                        _bucket(F.col(lo), bucket_width),
                        _bucket(F.col(hi), bucket_width),
                    )
                ),
            )
            .alias(name)
        )

    le = explode_side(left, left_lo, left_hi, "__l")
    re = explode_side(right, right_lo, right_hi, "__r")
    cond = F.col("__l.__bucket") == F.col("__r.__bucket")
    for k in extra_keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    # Qualified refs: the two sides may share bound column names
    # outside extra_keys.
    llo, lhi = F.col(f"__l.{left_lo}"), F.col(f"__l.{left_hi}")
    rlo, rhi = F.col(f"__r.{right_lo}"), F.col(f"__r.{right_hi}")
    first_shared = F.greatest(
        _bucket(llo, bucket_width), _bucket(rlo, bucket_width)
    )
    out = (
        le.join(re, cond, "inner")
        .where(
            (llo <= rhi)
            & (rlo <= lhi)
            & (F.col("__l.__bucket") == first_shared)
        )
        .drop(F.col("__l.__bucket"))
        .drop(F.col("__r.__bucket"))
    )
    for k in extra_keys:
        out = out.drop(F.col(f"__r.{k}"))
    return out
