"""Similarity search over embedding columns (array<float>).

Two paths:

- brute_force_topk: exact cosine top-k. The query set is broadcast (it is
  small by construction); the corpus streams through executors once, each
  partition keeps a per-query heap via TakeOrdered-style window. Exact
  and embarrassingly parallel — the right baseline, and the right
  *verify* stage at any scale.

- ann_lsh_topk: approximate path for when queries x corpus is too big.
  Random-hyperplane LSH: s deterministic pseudo-random hyperplanes (md5
  sign trick, so results are reproducible and testable) give each vector
  an s-bit signature; candidates = corpus vectors whose signature is
  within `probe_hamming` of the query's; exact cosine re-ranks the
  candidates. Tunables trade recall for candidate count. At 100 TB the
  signature pass is one linear scan, the rerank touches only buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockpy_spark.functions.text import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Returns (query_id, neighbor_id,
    cosine, rank), cosine rounded to 6, rank deterministic (ties by
    neighbor id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane(j: int, dim: int) -> list[float]:
    """Deterministic +-1 hyperplane j: sign d = first md5('j|d') nibble
    >= 8. No RNG state to ship to executors; reproducible everywhere."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{j}|{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0
        for d in range(dim)
    ]


def _hyperplane_signature(vec_col: F.Column, dim: int, n_planes: int) -> F.Column:
    """s-bit signature: bit j = sign of <v, plane_j>. One zip_with fold
    per plane — stays inside codegen, no UDF."""
    sig = F.lit(0)
    for j in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(j, dim)])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig.cast("int")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    dim: int,
    n_planes: int = 12,
    probe_hamming: int = 2,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidate generation + exact
    cosine rerank. Candidates = corpus rows whose signature hamming
    distance from the query signature <= probe_hamming."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _hyperplane_signature(F.col(vec_col), dim, n_planes).alias("qsig"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _hyperplane_signature(F.col(vec_col), dim, n_planes).alias("csig"),
    )
    joined = c.join(
        F.broadcast(q),
        F.bit_count(
            F.col("csig").bitwiseXOR(F.col("qsig")).cast("long")
        )
        <= probe_hamming,
    )
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
