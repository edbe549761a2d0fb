"""Scalar column functions (SURVEY.md §2.8 F1-F7).

Column-in/Column-out so they compose inside any select/withColumn; all
builtin expressions (codegen'd, no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_time_suffix(col: Column | str) -> Column:
    """F1 — strip 'T...' time-of-day from an ISO-8601 string (reference:
    regexp_replace(col, "T.*", ""), transform_news_job.py:104-106)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "T.*", "")


def to_date_col(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """F2 (reference: transform_stocks_job.py:132)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, fmt)


def nan_to_null(col: Column | str) -> Column:
    """F3 — NaN/NULL normalization for float columns (reference:
    extract_stocks_job.py:106-141)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull() & ~F.isnan(c), c).otherwise(F.lit(None))


def normalize_text(col: Column | str) -> Column:
    """Lowercase, trim, collapse internal whitespace — the engine-side
    version of the reference's driver-side ``lower().strip()``
    (transform_news_job.py:63)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
