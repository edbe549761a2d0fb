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
    """S9 — external parquet table DDL (reference Hive-style DDL,
    transform_stocks_job.py:56-85; here the Spark-native datasource form,
    which works against any catalog implementation — in-memory, Hive
    metastore, or Glue Catalog alike). ``columns_ddl`` like
    ``"id BIGINT, name STRING"``; ``partitioned_by`` like
    ``"dataproc STRING"`` (partition columns are appended to the schema).
    """
    if partitioned_by:
        part_names = ", ".join(
            c.strip().split()[0] for c in partitioned_by.split(",")
        )
        schema = f"{columns_ddl}, {partitioned_by}"
        part = f"PARTITIONED BY ({part_names})"
    else:
        schema, part = columns_ddl, ""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} ({schema})
        USING PARQUET
        {part}
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
