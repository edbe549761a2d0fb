"""Scan operators (SURVEY.md §2.1 S1/S2 + partition-predicate reads).

The reference prunes partitions by string-formatting the S3 path
(transform_stocks_job.py:32 reads ``.../dataproc={PROCESS_DATE}/``). We
instead read the table root and filter on the partition column so
Catalyst's partition pruning (and dynamic partition pruning for joins)
does the work — the same query then works across N partitions and the
pruning shows up in the physical plan as ``PartitionFilters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S1 — parquet scan. Pass an explicit schema in pipelines (never
    rely on inference in the engine core; reference cite
    transform_stocks_job.py:107-119)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """S2 — catalog scan (reference: DynamicFrame catalog read,
    transform_news_job.py:320-323; plain ``spark.table`` here)."""
    return spark.table(table)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = '"',
    multiline: bool = False,
) -> DataFrame:
    """CSV scan with a REQUIRED explicit schema — inference reads the
    data twice and guesses types, both wrong at scale. Defaults to
    RFC-4180 quoting (escape = doubled quote), which is what external
    writers produce; Spark's own default (backslash escape) is the
    minority dialect. ``multiline`` handles quoted embedded newlines
    but makes files unsplittable (one task per file) — leave it off
    unless the data needs it."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("multiLine", multiline)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Newline-delimited JSON scan, explicit schema (inference on JSON is
    a full extra pass over 100 TB)."""
    return spark.read.schema(schema).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    row_tag: str = "row",
) -> DataFrame:
    """XML scan via Spark 4's NATIVE xml source (the spark-xml package
    folded into core) — explicit schema like the other text readers
    (inference is a full extra pass), one row per ``row_tag`` element.
    Ingestion-edge format: row-oriented, no pushdown — rewrite as
    parquet first thing, like CSV/JSON."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_partition(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partition_value: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Partition-pruned scan: predicate on the partition column instead of
    path math, so Catalyst prunes at planning time (SURVEY.md §4.1)."""
    return read_parquet(spark, path, schema).where(
        F.col(partition_col) == F.lit(partition_value)
    )


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with schema evolution (``mergeSchema``): unions the
    footers of every file under ``path``, so a table whose writers
    added columns over time reads as the superset schema with NULLs
    where old files lack a column — the additive-evolution contract a
    long-lived lake table needs. Off by default in Spark because footer
    merging costs a file-listing pass; this entry point makes the cost
    explicit and opt-in rather than a session-wide conf. Renames and
    type changes are NOT evolution (they are breaking changes — the
    reference's fuzzy drift alignment in project.align_to_columns is
    the remediation path for those)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
