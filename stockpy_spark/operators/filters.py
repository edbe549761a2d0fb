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
