"""merge_upsert unit tests + text-format fixture edge cases (the oracle
twins are merge_incremental_upsert / fmt_csv_events / fmt_json_events /
fmt_orc_events; these cover shapes the fixture data may not hit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockpy_spark.operators.merge import merge_upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_merge_upsert_updates_win_and_inserts_append(spark):
    base = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    updates = _df(spark, [(2, "B"), (4, "D")])
    got = {r.k: r.v for r in merge_upsert(base, updates, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_upsert_compound_key(spark):
    base = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0)], "k long, p string, v double"
    )
    updates = spark.createDataFrame([(1, "y", 99.0)], "k long, p string, v double")
    got = {(r.k, r.p): r.v for r in merge_upsert(base, updates, ["k", "p"]).collect()}
    assert got == {(1, "x"): 10.0, (1, "y"): 99.0}


def test_merge_upsert_empty_updates_is_identity(spark):
    base = _df(spark, [(1, "a"), (2, "b")])
    updates = _df(spark, []).limit(0)
    got = sorted(map(tuple, merge_upsert(base, updates, "k").collect()))
    assert got == [(1, "a"), (2, "b")]


def test_merge_upsert_schema_mismatch_raises(spark):
    base = _df(spark, [(1, "a")])
    updates = spark.createDataFrame([(2, "b", 1.0)], "k long, v string, extra double")
    with pytest.raises(Exception):
        merge_upsert(base, updates, "k").collect()


def test_csv_round_trip_preserves_adversarial_strings(spark, tmp_path):
    """Commas, doubled quotes, braces and newlines inside a field must
    survive the RFC-4180 writer/reader pair readers.read_csv defaults
    to."""
    from pyspark.sql import types as T

    from stockpy_spark.sources.readers import read_csv

    rows = [
        (1, 'a,b,"c",{d}'),
        (2, 'line1\nline2'),
        (3, ''),
        (4, None),
    ]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    src = spark.createDataFrame(rows, schema)
    dest = str(tmp_path / "adversarial_csv")
    (
        src.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(dest)
    )
    back = read_csv(spark, dest, schema, multiline=True).withColumn(
        "s", F.coalesce("s", F.lit(None))
    )
    got = {r.id: r.s for r in back.collect()}
    # CSV cannot distinguish empty string from NULL; both read as NULL
    assert got[1] == rows[0][1]
    assert got[2] == rows[1][1]
    assert got[3] is None and got[4] is None


def test_read_parquet_evolved_additive_columns(spark, tmp_path):
    """Two writer generations (v2 adds a column): mergeSchema reads the
    superset with NULLs for old files; the default reader may silently
    pick one footer — the difference this entry point exists for."""
    from pyspark.sql import functions as F

    from stockpy_spark.sources.readers import read_parquet_evolved

    path = str(tmp_path / "evolving")
    spark.range(3).select("id").write.parquet(path)
    (
        spark.range(3, 6)
        .select("id", (F.col("id") * 10).alias("score"))
        .write.mode("append").parquet(path)
    )
    out = read_parquet_evolved(spark, path)
    assert set(out.columns) == {"id", "score"}
    rows = {r.id: r.score for r in out.collect()}
    assert rows[0] is None and rows[4] == 40
    assert len(rows) == 6
