"""Round-6 fourth wave: exact prefix-filtered set-similarity join,
drift screens (PSI / KS), association statistics, CUSUM change-point.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from stockpy_spark.operators.drift import ks_2samp, population_stability_index
from stockpy_spark.operators.setsim import jaccard_similarity_join
from stockpy_spark.operators.stats import (
    categorical_association,
    correlation_matrix,
)
from stockpy_spark.operators.timeseries import cusum_changepoint


# --- jaccard_similarity_join ---------------------------------------------

def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="alpha beta gamma delta"),          # dup of 1
            Row(doc_id=3, text="alpha beta gamma epsilon"),        # 3/5 of 1
            Row(doc_id=4, text="zeta eta theta iota kappa"),       # disjoint
            Row(doc_id=5, text="Alpha BETA gamma delta"),          # case dup
            Row(doc_id=6, text=""),                                # empty
        ]
    )


def _pairs(spark, t):
    out = jaccard_similarity_join(_docs(spark), "text", "doc_id", t)
    return {(r.id_a, r.id_b): r.jaccard for r in out.collect()}


def test_setsim_matches_bruteforce(spark):
    got = _pairs(spark, 0.5)
    # brute force over the token sets
    docs = {
        1: {"alpha", "beta", "gamma", "delta"},
        2: {"alpha", "beta", "gamma", "delta"},
        3: {"alpha", "beta", "gamma", "epsilon"},
        4: {"zeta", "eta", "theta", "iota", "kappa"},
        5: {"alpha", "beta", "gamma", "delta"},
    }
    want = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(docs[a] & docs[b]) / len(docs[a] | docs[b])
            if j >= 0.5:
                want[(a, b)] = round(j, 6)
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 5) in got  # case-folded duplicate
    assert not any(4 in p or 6 in p for p in got)


def test_setsim_exact_threshold_boundary(spark):
    # jaccard(1,3) = 3/5 = 0.6 exactly: included at 0.6, excluded above
    assert (1, 3) in _pairs(spark, 0.6)
    assert (1, 3) not in _pairs(spark, 0.61)


# --- PSI -----------------------------------------------------------------

def test_psi_identical_distributions_is_zero(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = population_stability_index(df, df, "v", n_bins=10).collect()
    assert len(out) == 10
    assert all(r.psi == 0.0 and r.psi_term == 0.0 for r in out)
    assert all(r.n_ref == r.n_cur == 100 for r in out)


def test_psi_shift_detected_and_clamped(spark):
    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = ref.select((F.col("v") + 200.0).alias("v"))  # fully out of range
    out = population_stability_index(ref, cur, "v", n_bins=10).collect()
    # all current mass clamps into the top bin
    top = [r for r in out if r.bin == 9][0]
    assert top.n_cur == 1000
    assert top.psi > 1.0  # massive drift


# --- KS ------------------------------------------------------------------

def test_ks_identical_zero_and_disjoint_one(spark):
    a = spark.range(500).select((F.col("id") % 50).cast("double").alias("v"))
    row = ks_2samp(a, a, "v").collect()[0]
    assert row.d_stat == 0.0 and row.n_ref == row.n_cur == 500
    b = a.select((F.col("v") + 1000.0).alias("v"))
    row = ks_2samp(a, b, "v").collect()[0]
    assert row.d_stat == 1.0
    # D=1 is attained at the largest ref value (all ref mass below all cur)
    assert row.at_value == 49.0


def test_ks_matches_scipy_style_reference(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    a = spark.createDataFrame([(v,) for v in xs], ["v"])
    b = spark.createDataFrame([(v,) for v in ys], ["v"])
    row = ks_2samp(a, b, "v", n_buckets=4).collect()[0]
    pooled = sorted(set(xs + ys))
    d = max(
        abs(
            sum(1 for x in xs if x <= v) / len(xs)
            - sum(1 for y in ys if y <= v) / len(ys)
        )
        for v in pooled
    )
    assert row.d_stat == round(d, 6)


# --- correlation matrix ---------------------------------------------------

def test_correlation_matrix_exact_pairs(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0, float(-i), float(i * i)) for i in range(20)],
        ["a", "b", "c", "d"],
    )
    rows = {(r.col_x, r.col_y): r for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert rows[("a", "b")].r == 1.0  # perfectly linear
    assert rows[("a", "c")].r == -1.0
    assert all(r.n == 20 for r in rows.values())


def test_correlation_matrix_listwise_deletion(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (3.0, 3.0), (4.0, 4.0)], ["a", "b"]
    )
    row = correlation_matrix(df, ["a", "b"]).collect()[0]
    assert row.n == 3  # the null row dropped from every pair


# --- categorical association ---------------------------------------------

def test_categorical_association_independent(spark):
    # perfectly independent 2x2 with equal counts -> chi2 = 0, MI = 0
    data = [(x, y) for x in "AB" for y in "XY" for _ in range(25)]
    df = spark.createDataFrame(data, ["x", "y"])
    out = categorical_association(df, "x", "y").collect()
    assert len(out) == 4
    assert all(r.chi2 == 0.0 and r.mutual_info == 0.0 for r in out)
    assert all(r.exp_n == 25.0 for r in out)


def test_categorical_association_deterministic_dependence(spark):
    # y fully determined by x -> V = 1, MI = ln(2) for a uniform 2x2
    data = [("A", "X")] * 30 + [("B", "Y")] * 30
    df = spark.createDataFrame(data, ["x", "y"])
    out = categorical_association(df, "x", "y").collect()
    assert all(r.cramers_v == 1.0 for r in out)
    assert all(r.mutual_info == round(math.log(2.0), 6) for r in out)


# --- CUSUM ----------------------------------------------------------------

def _cusum_rows(spark, vals, **kw):
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], ["k", "t", "v"]
    )
    return cusum_changepoint(
        df, "k", "t", "v", tiebreak_col=None, **kw
    ).collect()[0]


def test_cusum_matches_recursion(spark):
    vals = [10, 100, 200, 5, 5, 300, 1, 400]
    target, slack, thr = 50.0, 5.0, 200.0
    s = smax = 0.0
    alarms = 0
    first = None
    prev = 0.0
    for i, v in enumerate(vals, 1):
        s = max(0.0, s + (v - target - slack))
        if prev < thr <= s:
            alarms += 1
            first = first or i
        smax = max(smax, s)
        prev = s
    row = _cusum_rows(spark, vals, target=target, slack=slack, threshold=thr)
    assert row.cusum_final == round(s, 6)
    assert row.cusum_max == round(smax, 6)
    assert row.n_alarms == alarms
    assert row.first_alarm_idx == first


def test_cusum_quiet_series_no_alarm(spark):
    row = _cusum_rows(
        spark, [50] * 20, target=50.0, slack=5.0, threshold=10.0
    )
    assert row.cusum_final == 0.0
    assert row.cusum_max == 0.0
    assert row.n_alarms == 0
    assert row.first_alarm_idx is None
