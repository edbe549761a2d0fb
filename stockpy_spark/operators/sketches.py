"""Mergeable-sketch aggregates: the 100 TB pattern for DISTINCT rollups.

`reaggregate` (timeseries.py) proves sum/count/min/max roll up from fine
partials to coarse grids without rescanning raw data — but COUNT
DISTINCT is not decomposable: daily exact distinct-user counts cannot be
summed into a monthly one. The lakehouse answer is a mergeable sketch:
keep one tiny HLL (Datasketches HllSketch, the engine behind Spark's
``hll_sketch_agg``) per fine bucket, and union sketches upward — KB of
state per bucket, one narrow shuffle per rollup level, bounded relative
error (~1.6% at lgK=12). Spark ships the full algebra as built-ins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so
this stays JVM-side with zero UDFs.

Correctness gating: sketch binaries are engine-specific, so the raw
sketches have no cross-engine oracle. Like the ANN/LSH families
(registry_ext gate queries), the QUALITY CONTRACT is hash-checked
instead: the rollup emits the coarse estimate alongside the exact
distinct count and a gate column that is 1 iff the relative error
clears the floor; the DuckDB oracle states the expected gate rows by
computing the exact side with real SQL.

Reference parity: none (the reference has no sketches); extension
surface per the LLM-pipeline brief (corpus-scale distinct counting:
unique users/domains/fingerprints per shard, rolled up without rescan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Datasketches HLL accuracy knob: 2^12 registers, ~1.6% stderr.
DEFAULT_LGK = 12


def hll_bucket_sketches(
    df: DataFrame,
    time_col: str,
    key_col: str,
    bucket_seconds: int,
    group_cols: list[str] | None = None,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch of ``key_col``'s distinct values per
    (``group_cols``, time bucket). This is the state a streaming or
    daily-batch job persists: KB per bucket regardless of cardinality,
    and — unlike an exact distinct — mergeable upward by
    :func:`hll_merge_rollup` without touching raw data again.
    One shuffle, map-side partial sketch merge."""
    group_cols = group_cols or []
    bucket = F.timestamp_seconds(
        (F.col(time_col).cast("timestamp").cast("long") / bucket_seconds)
        .cast("long") * bucket_seconds
    ).alias("bucket_start")
    return df.groupBy(*group_cols, bucket).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll"),
        F.count(key_col).alias("n_rows"),
    )


def hll_merge_rollup(
    sketches: DataFrame,
    coarse_seconds: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Roll fine-bucket sketches up to a coarser grid by unioning the
    sketch state (``hll_union_agg``) — the coarse level reads only the
    fine SKETCHES, never the raw events, which is what makes a
    month-over-100 TB distinct query cost MBs instead of a rescan.
    Emits the coarse estimate; input row counts sum alongside."""
    group_cols = group_cols or []
    coarse = F.timestamp_seconds(
        (F.col("bucket_start").cast("long") / coarse_seconds).cast("long")
        * coarse_seconds
    ).alias("bucket_start")
    return (
        sketches.groupBy(*group_cols, coarse)
        .agg(
            F.hll_union_agg("hll").alias("hll"),
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_fine_buckets"),
        )
        .withColumn("approx_distinct", F.hll_sketch_estimate("hll"))
    )


def hll_rollup_quality(
    df: DataFrame,
    time_col: str,
    key_col: str,
    fine_seconds: int,
    coarse_seconds: int,
    max_rel_err: float = 0.05,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """The hash-checkable quality contract for the two-level HLL rollup:
    per coarse bucket, the sketch-merge estimate must sit within
    ``max_rel_err`` of the exact distinct count (computed here as the
    verify-tier full pass — at test SF it is cheap; at 100 TB only the
    sketch path runs). Returns (bucket_start, exact_distinct,
    n_fine_buckets, gate_rel_err_ok) — deterministic because Spark's
    HLL is seed-fixed, so the driver hash gate pins the whole
    sketch algebra."""
    if coarse_seconds % fine_seconds != 0:
        raise ValueError(
            f"coarse grid {coarse_seconds}s is not a multiple of the fine "
            f"grid {fine_seconds}s — fine buckets would straddle coarse ones"
        )
    fine = hll_bucket_sketches(df, time_col, key_col, fine_seconds, lgk=lgk)
    merged = hll_merge_rollup(fine, coarse_seconds)
    coarse = F.timestamp_seconds(
        (F.col(time_col).cast("timestamp").cast("long") / coarse_seconds)
        .cast("long") * coarse_seconds
    ).alias("bucket_start")
    exact = df.groupBy(coarse).agg(
        F.countDistinct(key_col).alias("exact_distinct")
    )
    return (
        merged.join(exact, "bucket_start")
        .select(
            "bucket_start",
            "exact_distinct",
            "n_fine_buckets",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * F.lit(max_rel_err)
            ).cast("int").alias("gate_rel_err_ok"),
        )
    )
