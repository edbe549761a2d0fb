"""Filter-family operators (SURVEY.md §2.2 P6-P8).

Plain Column predicates — Catalyst pushes them to the parquet scan
(``PushedFilters`` in the physical plan), which is the difference between
reading 100 TB and reading the row groups that matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_not_null_positive(
    df: DataFrame, not_null: list[str] | None = None, positive: list[str] | None = None
) -> DataFrame:
    """P6 — conjunction of NOT NULL and > 0 predicates (reference:
    transform_stocks_job.py:138-140 — sector non-null, close>0, volume>0).
    """
    out = df
    for c in not_null or []:
        out = out.filter(F.col(c).isNotNull())
    for c in positive or []:
        out = out.filter(F.col(c) > 0)
    return out


def filter_cross_column_equal(df: DataFrame, left: str, right: str) -> DataFrame:
    """P7 — keep rows where two columns are both non-null and equal
    (reference: published_date == extracted_date,
    transform_news_job.py:112-116)."""
    l, r = F.col(left), F.col(right)
    return df.filter(l.isNotNull() & r.isNotNull() & (l == r))


def drop_na_subset(df: DataFrame, subset: list[str]) -> DataFrame:
    """P8 (reference: transform_news_job.py:126-129)."""
    return df.na.drop(subset=subset)


def robust_clip_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    mad_k: float = 5.0,
    dp: int = 6,
) -> DataFrame:
    """Per-group winsorization + robust (median/MAD) outlier flagging —
    the numeric-feature cleaning stage of a training-data pipeline.

    Adds to each row: ``clipped`` = value winsorized to the group's
    [lo_q, hi_q] exact percentiles, and ``is_outlier`` =
    |value - median| > mad_k * MAD (MAD = median absolute deviation,
    the robust sigma — immune to the very outliers it flags, unlike a
    mean/stddev z-score). Group statistics are rounded to ``dp`` before
    clipping/comparison so an independent engine replays identically.

    Scale shape: two grouped aggregates over the fact table (each one
    shuffle on the group key, map-side combined) — quantiles first,
    then MAD against the joined medians. The stats frames are NOT
    force-broadcast: they are GROUP-cardinality-sized, KBs for event
    types but fact-sized for per-user groups — the q3/basket "fact in
    disguise" lesson; plain equi-joins let AQE broadcast them only
    while they fit. Exact percentile keeps the oracle exact; at 100 TB
    swap approx_percentile in for the same plan shape with bounded
    memory.
    """
    stats = df.groupBy(*group_cols).agg(
        F.round(F.expr(f"percentile({value_col}, {lo_q})"), dp).alias("__lo"),
        F.round(F.expr(f"percentile({value_col}, {hi_q})"), dp).alias("__hi"),
        F.round(F.expr(f"percentile({value_col}, 0.5)"), dp).alias("__med"),
    )
    with_med = df.join(stats, group_cols)
    mad = (
        with_med.withColumn("__adev", F.abs(F.col(value_col) - F.col("__med")))
        .groupBy(*group_cols)
        .agg(F.round(F.expr("percentile(__adev, 0.5)"), dp).alias("__mad"))
    )
    return (
        with_med.join(mad, group_cols)
        .withColumn(
            "clipped",
            F.round(
                F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
                dp,
            ),
        )
        .withColumn(
            "is_outlier",
            F.abs(F.col(value_col) - F.col("__med")) > mad_k * F.col("__mad"),
        )
        .drop("__lo", "__hi", "__med", "__mad", "__adev")
    )
