"""Smoke tests for the driver contract + sink idempotence."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F
from stockpy_spark.sources import (
    write_parquet_overwrite_partitions,
    write_parquet_partitioned,
)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"event_id", "user_id", "event_type", "value"}


def test_queries_oracle_keys_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)
    # the vast majority of queries must be oracle-checked
    assert len(oracles) >= 0.8 * len(qs)


def test_all_queries_run_sf0001(spark, sf_dir):
    """Every declared query must at least execute at the smallest SF."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_dynamic_partition_overwrite_idempotent(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tbl")
    df = spark.createDataFrame(
        [("20240101", 1), ("20240101", 2), ("20240102", 3)], "dataproc string, v int"
    )
    write_parquet_partitioned(df, path, ["dataproc"], mode="overwrite")
    # rerun day 1 only — must replace, not append (reference bug fixed)
    day1 = df.filter("dataproc = '20240101'")
    write_parquet_overwrite_partitions(day1, path, ["dataproc"])
    out = spark.read.parquet(path)
    assert out.count() == 3
    assert out.filter("dataproc = '20240101'").count() == 2


def test_write_sorted_for_pruning_disjoint_row_groups(spark, tmp_path):
    """Range-clustered write must produce files with narrow, mostly
    disjoint min/max ranges on the sort column — the property parquet
    row-group pruning needs. Verified against the actual parquet footer
    statistics via pyarrow."""
    import glob as globmod

    import pyarrow.parquet as pq

    from stockpy_spark.sources import write_sorted_for_pruning

    df = spark.range(100_000).select(
        (F.hash("id") % 10_000).alias("k"), F.col("id").alias("v")
    )
    dest = str(tmp_path / "clustered")
    write_sorted_for_pruning(df, dest, ["k"], n_files=8)

    ranges = []
    for f in globmod.glob(f"{dest}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            ranges.append((col.statistics.min, col.statistics.max))
    assert len(ranges) >= 8
    ranges.sort()
    # each range must be narrow (disjointness up to range-boundary overlap)
    overlaps = sum(1 for (a, b) in zip(ranges, ranges[1:]) if a[1] > b[0])
    assert overlaps == 0, f"row-group ranges overlap: {ranges}"
    # and the rows round-trip
    assert spark.read.parquet(dest).count() == 100_000
