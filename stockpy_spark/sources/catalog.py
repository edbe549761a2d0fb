"""Catalog DDL + partition discovery (SURVEY.md §2.1 S8-S11).

The reference talks to the Glue Data Catalog three different ways (Spark
SQL DDL, boto3 create_table, Athena fallback — transform_news_job.py:
266-307). On Spark the catalog *is* the metastore, so the whole fallback
ladder collapses to ``spark.sql`` DDL + ``recoverPartitions``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def create_database(spark: SparkSession, name: str) -> None:
    """S8 (reference: extract_news_job.py:324, extract_stocks_job.py:177-189)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_external_table(
    spark: SparkSession,
    table: str,
    columns_ddl: str,
    location: str,
    partitioned_by: str | None = None,
) -> None:
    """S9 — external parquet table DDL (reference:
    transform_stocks_job.py:56-85). ``columns_ddl`` like
    ``"id BIGINT, name STRING"``; ``partitioned_by`` like
    ``"dataproc STRING"``.
    """
    part = f"PARTITIONED BY ({partitioned_by})" if partitioned_by else ""
    spark.sql(
        f"""
        CREATE EXTERNAL TABLE IF NOT EXISTS {table} ({columns_ddl})
        {part}
        STORED AS PARQUET
        LOCATION '{location}'
        """
    )


def repair_partitions(spark: SparkSession, table: str) -> None:
    """S10 — partition discovery (reference MSCK ladder,
    extract_stocks_job.py:319-349; one call here)."""
    spark.catalog.recoverPartitions(table)


def table_exists(spark: SparkSession, table: str) -> bool:
    """S11 — existence probe (reference: DESCRIBE-in-try/except,
    transform_stocks_job.py:37-52)."""
    return spark.catalog.tableExists(table)
