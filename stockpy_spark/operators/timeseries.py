"""Hypertable-style time-bucket rollups (continuous aggregates).

The TimescaleDB/Druid pattern re-expressed as plain Spark aggregation:
``time_bucket`` floors timestamps onto a fixed grid; a *continuous
aggregate* is one groupBy over (bucket, dims) producing decomposable
partial aggregates (count / sum / min / max / sum-of-squares); coarser
resolutions REAGGREGATE the finer rollup instead of rescanning raw data
— sum of sums, sum of counts, min of mins. At 100 TB that is the whole
game: the daily rollup reads the 6-hour rollup (4 rows/bucket/dim), not
the raw events, and derived means/stddevs come out exactly because every
partial is algebraic, not holistic.

Reference parity: the reference's transform jobs aggregate per
``dataproc`` day-partition only (transform_stocks_job.py:171-207); the
multi-resolution grid is extension surface for the training-pipeline
workload (event-rate features at several granularities).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts_col: str | Column, width_seconds: int) -> Column:
    """Epoch-second start of the fixed-width bucket containing ``ts``.

    Cast through TIMESTAMP so parquet TIMESTAMP_NTZ columns (Spark 4's
    default read of UTC-naive micros) work; the session tz is pinned UTC
    so the grid is the UTC grid, matching DuckDB's ``epoch()``.
    Returned as BIGINT rather than a timestamp: the grid survives
    cross-engine comparison and arithmetic without tz re-interpretation.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    w = int(width_seconds)
    return (
        F.floor(c.cast("timestamp").cast("long") / F.lit(w)) * F.lit(w)
    ).cast("long")


def continuous_aggregate(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    dims: list[str],
    value_col: str,
    bucket_name: str = "bucket_start",
) -> DataFrame:
    """One-shuffle rollup onto a fixed time grid.

    Emits only decomposable partials (n, sum, min, max, sum of squares)
    so any coarser resolution can be derived with :func:`reaggregate`
    without touching raw data. Derived stats (mean, variance) belong at
    query time: ``sum/n`` and ``(sumsq - sum^2/n)/n`` are exact from the
    partials at every resolution.
    """
    return df.groupBy(
        time_bucket(ts_col, width_seconds).alias(bucket_name), *dims
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("sumsq_v"),
    )


def reaggregate(
    rollup: DataFrame,
    coarse_width_seconds: int,
    dims: list[str],
    bucket_name: str = "bucket_start",
) -> DataFrame:
    """Coarser rollup FROM a finer one — no raw-data scan.

    Requires ``coarse_width`` to be a multiple of the finer grid width
    (not checked: a non-multiple silently splits fine buckets across
    coarse ones, which is a modeling error, not a code path).
    """
    w = int(coarse_width_seconds)
    coarse = (F.floor(F.col(bucket_name) / F.lit(w)) * F.lit(w)).cast("long")
    return rollup.groupBy(coarse.alias(bucket_name), *dims).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sumsq_v").alias("sumsq_v"),
    )
