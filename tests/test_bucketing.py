"""Equal-frequency bucketing helper (operators/bucketing.py) and the
dense-cluster matched_controls sub-bucket closure — the round-12 fix
for the r11 verdict's outlier-fragility finding."""

from __future__ import annotations

import bisect
import random

from pyspark.sql import functions as F

from stockpy_spark.operators.bucketing import freq_edges, with_freq_bucket


def test_freq_bucket_matches_bisect_with_outlier(spark):
    # one sentinel at 1e12 plus a heavy duplicate run — the exact
    # shapes that collapsed the old equal-width formula
    rng = random.Random(7)
    vals = [rng.uniform(0, 100) for _ in range(500)] + [5.0] * 200
    vals.append(1.0e12)
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    census = df.agg(freq_edges("v", 16).alias("e")).localCheckpoint(
        eager=True
    )
    edges = census.collect()[0]["e"]
    assert edges == sorted(edges)
    out = with_freq_bucket(
        df.crossJoin(F.broadcast(census)), F.col("v"), F.col("e"), 16, "b"
    ).collect()
    for r in out:
        assert r["b"] == bisect.bisect_left(edges, r["v"]), (r["v"], r["b"])
    # the outlier must NOT drag everything into bucket 0: with
    # equal-frequency edges the used bucket count stays ~n_buckets
    used = {r["b"] for r in out}
    assert len(used) >= 12, used


def test_freq_bucket_descending_matches_bisect(spark):
    rng = random.Random(11)
    vals = [rng.uniform(0, 100) for _ in range(300)] + [1.0e12]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    census = df.agg(freq_edges("v", 8).alias("e")).localCheckpoint(
        eager=True
    )
    edges = census.collect()[0]["e"]
    out = with_freq_bucket(
        df.crossJoin(F.broadcast(census)),
        F.col("v"),
        F.col("e"),
        8,
        "b",
        descending=True,
    ).collect()
    for r in out:
        # #edges strictly above v
        expect = len(edges) - bisect.bisect_right(edges, r["v"])
        assert r["b"] == expect, (r["v"], r["b"], expect)
    # bucket 0 holds the largest value
    assert max(out, key=lambda r: r["v"])["b"] == 0


def test_freq_bucket_constant_and_empty_edges(spark):
    # constant column -> all edges equal -> every row in bucket 0
    df = spark.createDataFrame([(3.0,)] * 20, ["v"])
    census = df.agg(freq_edges("v", 8).alias("e")).localCheckpoint(
        eager=True
    )
    out = with_freq_bucket(
        df.crossJoin(F.broadcast(census)), F.col("v"), F.col("e"), 8, "b"
    ).collect()
    assert {r["b"] for r in out} == {0}


def test_matched_controls_dense_cluster_brute_force(spark):
    """80% of pool AND eval values inside one tolerance width (the
    dense-cluster degeneration the sub-bucket closure exists for),
    eval-only and pool-only sub-regions, cross-sub carry-ins — checked
    row-for-row against a brute-force nearest-below reference."""
    from stockpy_spark.operators.sampling import matched_controls

    rng = random.Random(42)
    tol = 100.0
    # dense cluster in [500, 520); stragglers spread over [0, 5000)
    pool = [
        (i, 500.0 + rng.uniform(0, 20) if i % 5 else rng.uniform(0, 5000))
        for i in range(1, 201)
    ]
    ev = [
        (
            1000 + i,
            505.0 + rng.uniform(0, 15) if i % 5 else rng.uniform(0, 5000),
        )
        for i in range(1, 101)
    ]
    pool_df = spark.createDataFrame(pool, ["doc_id", "n"])
    ev_df = spark.createDataFrame(ev, ["doc_id", "n"])
    out = {
        r.eval_id: (r.control_id, r.control_val)
        for r in matched_controls(
            ev_df, pool_df, "doc_id", "n", tol, n_sub_buckets=8
        ).collect()
    }
    for eid, v in ev:
        cands = [(pv, pid) for pid, pv in pool if pv <= v and v - pv <= tol]
        expect = (
            (max(cands)[1], max(cands)[0]) if cands else (None, None)
        )
        assert out[eid] == expect, (eid, v, out[eid], expect)
