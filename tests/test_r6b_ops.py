"""Second-wave round-6 operators: BM25 retrieval, deterministic k-means,
robust clipping, and the q2/q11 TPC-H shapes (oracle parity is the
driver gate; these tests pin the operator contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockpy_spark.operators.filters import robust_clip_outliers
from stockpy_spark.operators.similarity import kmeans_assign
from stockpy_spark.operators.textstats import bm25_topk
from stockpy_spark.registry_r6b import (
    q_q2_min_cost_supplier,
    q_q11_important_parts,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestBM25:
    def test_topk_contract(self, spark, sf_dir):
        out = bm25_topk(
            _docs(spark, sf_dir), "text", "doc_id", ["spark", "merge"], k=10
        ).collect()
        assert 0 < len(out) <= 10
        # ranks are 1..n, scores non-increasing, all positive (Lucene idf)
        ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ranks == list(range(1, len(out) + 1))
        scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(s > 0 for s in scores)
        assert all(1 <= r["n_terms"] <= 2 for r in out)

    def test_unmatched_terms_empty(self, spark, sf_dir):
        out = bm25_topk(
            _docs(spark, sf_dir), "text", "doc_id", ["zzzznotaword"], k=5
        )
        assert out.count() == 0


class TestKMeans:
    def test_assignment_contract(self, spark, sf_dir):
        emb = _emb(spark, sf_dir)
        out = kmeans_assign(emb, "embedding", "vec_id", k=4)
        rows = out.collect()
        assert len(rows) == emb.count()  # every vector assigned once
        assert {r["cid"] for r in rows} <= set(range(4))
        assert all(-1.0 <= r["sim"] <= 1.0 for r in rows)

    def test_deterministic_rerun(self, spark, sf_dir):
        emb = _emb(spark, sf_dir)
        a = sorted(map(tuple, kmeans_assign(emb, "embedding", "vec_id", k=4).collect()))
        b = sorted(map(tuple, kmeans_assign(emb, "embedding", "vec_id", k=4).collect()))
        assert a == b

    def test_seeds_self_assign(self, spark, sf_dir):
        # after one refinement the seed vector need not stay in "its"
        # cluster, but every cluster id in [0, k) must be seeded
        emb = _emb(spark, sf_dir)
        out = kmeans_assign(emb, "embedding", "vec_id", k=3)
        cids = {r["cid"] for r in out.select("cid").distinct().collect()}
        assert cids == {0, 1, 2}


class TestRobustClip:
    def test_clip_bounds_and_flags(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = robust_clip_outliers(ev, "value", ["event_type"], dp=4)
        assert out.count() == ev.count()
        # clipped values stay within each group's observed value range
        chk = (
            out.groupBy("event_type")
            .agg(
                F.min("clipped").alias("cmin"),
                F.max("clipped").alias("cmax"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
            .collect()
        )
        for r in chk:
            assert r["cmin"] >= r["vmin"] - 1e-4
            assert r["cmax"] <= r["vmax"] + 1e-4
        # winsorization actually clips something at p05/p95
        assert out.filter(F.col("clipped") != F.round("value", 4)).count() > 0
        # outliers are a small minority under a 5-MAD fence
        n_out = out.filter("is_outlier").count()
        assert n_out < 0.2 * ev.count()


class TestTpchShapes:
    def test_q2_one_row_per_part_and_min(self, spark, sf_dir):
        out = q_q2_min_cost_supplier(spark, sf_dir)
        assert out.groupBy("p_partkey").count().filter("count > 1").count() == 0
        # spot-check: reported min_cost is <= every observed EUROPE unit
        # cost for that part
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        naive = li.groupBy("l_partkey").agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("lo")
        )
        j = out.join(naive, out["p_partkey"] == naive["l_partkey"])
        assert j.filter(F.col("min_cost") < F.col("lo") - 1e-9).count() == 0

    def test_q11_threshold(self, spark, sf_dir):
        # sf0.001 has only 10 suppliers; use a nation that exists there
        out = q_q11_important_parts(spark, sf_dir, nationkey=8)
        n = out.count()
        assert n > 0
        # every surviving part clears 0.1% of the nation total
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").filter(
            "s_nationkey = 8"
        )
        tot = (
            li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .collect()[0][0]
        )
        assert out.filter(F.col("part_value") <= 0.001 * tot - 0.01).count() == 0
