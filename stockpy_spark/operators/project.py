"""Projection-family operators (SURVEY.md §2.2 P1-P5, P9).

All pure ``pyspark.sql.functions`` expressions — no UDFs — so every one of
these stays inside whole-stage codegen and Catalyst can prune/push through
them freely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType, FloatType


def _nan_safe(col: Column, dtype: DataType) -> Column:
    """NULL out NaN for float types; pass through otherwise."""
    if isinstance(dtype, (DoubleType, FloatType)):
        return F.when(col.isNotNull() & ~F.isnan(col), col).otherwise(F.lit(None))
    return col


def select_with_conditional_cast(
    df: DataFrame, casts: dict[str, DataType], keep: list[str] | None = None
) -> DataFrame:
    """P1 — project each column through NaN/NULL-normalizing conditional
    cast (reference: extract_stocks_job.py:105-142, where yfinance NaNs
    are scrubbed to NULL per column). ``keep`` columns pass through
    unchanged, in order, before the cast columns.
    """
    exprs: list[Column] = [F.col(c) for c in (keep or [])]
    for name, dtype in casts.items():
        cast_col = F.col(name).cast(dtype)
        exprs.append(_nan_safe(cast_col, dtype).alias(name))
    return df.select(*exprs)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2 — bulk rename (reference: 10 chained withColumnRenamed,
    transform_stocks_job.py:146-165; one ``withColumnsRenamed`` here)."""
    return df.withColumnsRenamed(mapping)


def add_literal_column(df: DataFrame, name: str, value, dtype: DataType | None = None) -> DataFrame:
    """P3 — constant column, e.g. the ``dataproc`` process-date partition
    key (reference: extract_stocks_job.py:158)."""
    col = F.lit(value)
    if dtype is not None:
        col = col.cast(dtype)
    return df.withColumn(name, col)


def _norm_name(name: str) -> str:
    return name.strip().lower().replace(" ", "_")


def align_to_columns(
    df: DataFrame, expected: dict[str, DataType], fuzzy: bool = True
) -> DataFrame:
    """P4 — schema alignment: match each expected column against the
    incoming frame, add the truly-missing ones as typed NULLs, and
    project to exactly the expected column set, in order (reference:
    transform_news_job.py:52-84 fuzzy schema-drift handler). Makes
    frames union-compatible for :func:`union_by_name`.

    Matching ladder (each rung runs as a FULL pass over the remaining
    expected columns before the next, weaker rung — so an exact match
    for a later expected column can never be stolen by an earlier
    column's fuzzy probe; each source column is claimed at most once):

    1. exact name;
    2. normalized name — lower/strip/space->underscore — so drifted
       headers like ``"Published Date"`` land on ``published_date``;
    3. underscore-insensitive containment, mirroring the reference's
       ``expected.replace("_","") in col.replace("_","")`` probe
       (transform_news_job.py:66-74).

    ``fuzzy=False`` restores strict exact-name matching.
    """
    used: set[str] = set()
    mapping: dict[str, str] = {}
    by_norm: dict[str, str] = {}
    for c in df.columns:
        by_norm.setdefault(_norm_name(c), c)
    for target in expected:
        if target in df.columns:
            mapping[target] = target
            used.add(target)
    if fuzzy:
        for target in expected:
            if target in mapping:
                continue
            cand = by_norm.get(_norm_name(target))
            if cand is not None and cand not in used:
                mapping[target] = cand
                used.add(cand)
        for target in expected:
            if target in mapping:
                continue
            tkey = _norm_name(target).replace("_", "")
            for c in df.columns:
                if c not in used and tkey in _norm_name(c).replace("_", ""):
                    mapping[target] = c
                    used.add(c)
                    break
    exprs = [
        (F.col(mapping[c]) if c in mapping else F.lit(None).cast(t)).alias(c)
        for c, t in expected.items()
    ]
    return df.select(*exprs)


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P5 (reference: transform_stocks_job.py:198)."""
    return df.drop(*cols)


def cast_columns(df: DataFrame, casts: dict[str, DataType]) -> DataFrame:
    """P9 — bulk re-cast (reference: transform_stocks_job.py:131-137)."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})
