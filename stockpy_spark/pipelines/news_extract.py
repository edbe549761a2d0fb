"""The reference's extract_news job as a thin operator composition.

Reproduces /root/reference/scripts/extract_news_job.py:245-316 behind
the connector seam: fetch scraped articles through a Connector (S4 —
the crawl itself stays off-cluster; Spark sees clean rows with the
explicit 9-column schema at extract_news_job.py:275-287) -> fuzzy
schema alignment (the scraper is exactly where drifted headers come
from) -> process-date partition literal -> idempotent partitioned
parquet sink (S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from stockpy_spark.operators import add_literal_column, align_to_columns
from stockpy_spark.pipelines.connectors import Connector
from stockpy_spark.sources.writers import write_parquet_overwrite_partitions

# extract_news_job.py:275-287 — all strings in the raw zone
NEWS_RAW_COLUMNS: dict[str, T.DataType] = {
    "ticker": T.StringType(),
    "company": T.StringType(),
    "sector": T.StringType(),
    "title": T.StringType(),
    "source": T.StringType(),
    "link": T.StringType(),
    "published_time": T.StringType(),
    "search_term": T.StringType(),
    "extracted_at": T.StringType(),
}

NEWS_RAW_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in NEWS_RAW_COLUMNS.items()]
)


def extract_news(
    spark: SparkSession,
    articles: Connector,
    process_date: str,
    output_path: str | None = None,
) -> DataFrame:
    """Compose the extract job; returns the raw-zone frame (and writes
    it partitioned by ``dataproc`` when ``output_path`` is given)."""
    fetched = articles.fetch(spark)
    aligned = align_to_columns(fetched, NEWS_RAW_COLUMNS)
    out = add_literal_column(aligned, "dataproc", process_date, T.StringType())
    if output_path is not None:
        write_parquet_overwrite_partitions(out, output_path, ["dataproc"])
    return out
