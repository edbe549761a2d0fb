"""Helpers for the driver-generated TPC-H-ish test tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table robustly across parquet timestamp units.

    The driver-generated events.parquet stores ``ts`` as
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects by default
    (PARQUET_TYPE_ILLEGAL). Fall back to the legacy nanos-as-long read and
    rebuild a micros timestamp (ns -> us floor division — the same
    truncation DuckDB/Arrow apply when narrowing ns to us).
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution
        if dict(df.dtypes).get("ts") == "timestamp":
            return df
    except Exception:
        pass
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # integer division — float division loses precision at ~1e18 ns
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {
        t: read_events(spark, sf_dir) if t == "events"
        else spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in names
    }


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    for t, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(t)
