"""Unit tests for projection/filter operators — reproduces the reference's
implicit edge cases (NaN->NULL, schema drift, cross-column equality)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import types as T

from stockpy_spark.operators import (
    align_to_columns,
    cast_columns,
    drop_na_subset,
    filter_cross_column_equal,
    filter_not_null_positive,
    rename_columns,
    select_with_conditional_cast,
)


def test_conditional_cast_nan_to_null(spark):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 3.5), (3, None)], "id int, v double"
    )
    out = select_with_conditional_cast(df, {"v": T.DoubleType()}, keep=["id"])
    rows = {r.id: r.v for r in out.collect()}
    assert rows[1] is None  # NaN scrubbed (reference extract_stocks_job.py:112-141)
    assert rows[2] == 3.5
    assert rows[3] is None


def test_rename_and_align(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = rename_columns(df, {"a": "id", "b": "name"})
    assert out.columns == ["id", "name"]

    aligned = align_to_columns(
        out, {"id": T.IntegerType(), "name": T.StringType(), "extra": T.DoubleType()}
    )
    assert aligned.columns == ["id", "name", "extra"]
    assert aligned.collect()[0].extra is None


def test_align_exact_match_not_stolen_by_earlier_fuzzy(spark):
    """An exact match for a LATER expected column must not be claimed by
    an EARLIER column's fuzzy containment probe: expected {'id',
    'doc_id'} over a frame with only 'doc_id' maps doc_id exactly and
    NULL-fills id (previously both landed on doc_id)."""
    df = spark.createDataFrame([(7, "x")], "doc_id int, text string")
    out = align_to_columns(
        df, {"id": T.IntegerType(), "doc_id": T.IntegerType()}
    )
    row = out.collect()[0]
    assert row.id is None
    assert row.doc_id == 7


def test_cast_columns(spark):
    df = spark.createDataFrame([("1", "2.5")], "a string, b string")
    out = cast_columns(df, {"a": T.LongType(), "b": T.DoubleType()})
    r = out.collect()[0]
    assert r.a == 1 and math.isclose(r.b, 2.5)


def test_filter_not_null_positive(spark):
    df = spark.createDataFrame(
        [(None, 1.0), ("s", 0.0), ("s", 2.0)], "sector string, close double"
    )
    out = filter_not_null_positive(df, not_null=["sector"], positive=["close"])
    assert out.count() == 1


def test_filter_cross_column_equal(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), (None, None)], "x string, y string"
    )
    assert filter_cross_column_equal(df, "x", "y").count() == 1


def test_drop_na_subset(spark):
    df = spark.createDataFrame(
        [Row(t="x", l="u", s=None), Row(t="x", l="u", s="src")],
        "t string, l string, s string",
    )
    assert drop_na_subset(df, ["t", "l", "s"]).count() == 1
