"""CSV / JSONL lake fixtures derived from the flat driver testdata.

Same pattern as hive_fixture.py: the driver ships parquet only, so
queries that must prove the TEXT-format readers (S-format coverage,
readers.read_csv/read_json) work end-to-end materialize the events
table as CSV / newline-delimited JSON under the repo scratch root, read
it back through the engine's readers, and aggregate — the DuckDB oracle
computes the same answer from the ORIGINAL flat parquet, so a hash
match proves the write -> text bytes -> read round-trip lost nothing.

What the round-trip actually stresses (and what flips the hash when a
serializer is sloppy):

- timestamps carried at MICROsecond precision through text (formatted
  explicitly — default CSV timestamp formatting truncates or
  locale-shifts);
- doubles surviving decimal text (Spark writes shortest-round-trip
  decimals; a %.6f-style writer would corrupt sums);
- the ``props`` column is JSON text full of commas, quotes and braces —
  RFC-4180 quote-doubling on CSV, escape sequences on JSON.

Scale note: text formats are ingestion-edge formats — row-oriented, no
column pruning, no predicate pushdown, no row-group statistics. The
engine reads them with an explicit schema (never inference — that is a
full extra pass over 100 TB) and the first thing a production pipeline
does is rewrite them as parquet (writers.py). These fixtures gate the
reader correctness, not a recommendation to query CSV at scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpy_spark.sources.readers import read_csv, read_json
from stockpy_spark.sources.testdata import read_events

FIXTURE_ROOT = "/root/repo/.format_fixture"

_built: set[str] = set()

# ts is serialized as an explicit micros string and restored by cast:
# letting the CSV writer pick a timestamp format is exactly the class
# of silent precision loss this fixture exists to catch.
TEXT_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _textified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.date_format(F.col("ts").cast("timestamp"), TS_FMT).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _ensure(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    path = f"{FIXTURE_ROOT}/{_sf_name(sf_dir)}/events_{fmt}"
    if path in _built and os.path.isdir(path):
        return path
    shutil.rmtree(path, ignore_errors=True)
    df = _textified(spark, sf_dir)
    if fmt == "csv":
        # RFC-4180 quoting (escape = doubled quote), not Spark's default
        # backslash escaping — external tools (DuckDB included) read
        # RFC-4180; props is full of commas and quotes, so a quoting bug
        # cannot hide
        (
            df.write.mode("overwrite")
            .option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .csv(path)
        )
    elif fmt == "json":
        df.write.mode("overwrite").json(path)
    else:
        raise ValueError(fmt)
    _built.add(path)
    return path


def events_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events round-tripped through CSV: write (once per process), read
    back via the engine's read_csv with explicit schema, restore ts."""
    path = _ensure(spark, sf_dir, "csv")
    raw = read_csv(spark, path, TEXT_EVENTS_SCHEMA)
    return raw.withColumn("ts", F.to_timestamp("ts", TS_FMT))


def events_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events round-tripped through newline-delimited JSON."""
    path = _ensure(spark, sf_dir, "json")
    raw = read_json(spark, path, TEXT_EVENTS_SCHEMA)
    return raw.withColumn("ts", F.to_timestamp("ts", TS_FMT))


def events_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events round-tripped through XML (Spark 4's native xml source):
    one <event> element per row, entity-escaping stressed by the
    quote/brace/ampersand-riddled props JSON column; ts travels as the
    explicit micros string like CSV/JSON."""
    from stockpy_spark.sources.readers import read_xml

    path = f"{FIXTURE_ROOT}/{_sf_name(sf_dir)}/events_xml"
    if path not in _built or not os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
        (
            _textified(spark, sf_dir)
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "events")
            .option("rowTag", "event")
            .save(path)
        )
        _built.add(path)
    raw = read_xml(spark, path, TEXT_EVENTS_SCHEMA, row_tag="event")
    return raw.withColumn("ts", F.to_timestamp("ts", TS_FMT))


def events_from_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events round-tripped through ORC — typed columnar, so timestamps
    travel natively (no string leg): the round-trip proves the ORC
    reader/writer pair preserves micros and doubles bit-for-bit."""
    from stockpy_spark.sources.readers import read_orc

    path = f"{FIXTURE_ROOT}/{_sf_name(sf_dir)}/events_orc"
    if path not in _built or not os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
        ev = read_events(spark, sf_dir).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        ev.write.mode("overwrite").orc(path)
        _built.add(path)
    return read_orc(spark, path)
