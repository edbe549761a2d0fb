"""Corpus-level text statistics: TF-IDF term weighting.

Column-level text features (tokens, quality, language) live in
functions.text; this module holds the transforms that need corpus
aggregates. Everything is builtin expressions — one explode, two
hash aggregations, one broadcast join; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stockpy_spark.functions.text import tokenize


def tfidf_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term, tf, df, tfidf): textbook TF-IDF over lowercase
    whitespace tokens. tf = raw term count in the doc; idf = ln(N/df)
    with N = docs containing at least one token; tfidf rounded to 6.

    Scale shape: the token explode feeds ONE (doc, term) aggregate
    (map-side combined); document frequency is a second aggregate of
    that output (already one row per doc-term, far smaller than the
    token stream); N is a 1-row broadcast. Nothing rescans the corpus.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select(F.countDistinct("doc").alias("n"))
    return (
        tf.join(dfreq, "term")  # vocabulary grows (Heaps' law): no hint
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("tfidf"),
        )
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    dp: int = 6,
) -> DataFrame:
    """Okapi BM25 ranked retrieval for a fixed query-term set:
    (doc, n_terms, score, rank), top-k by score (ties broken by doc id).

    idf is the Lucene-style smoothed Robertson-Sparck Jones form
    ln((N - df + 0.5) / (df + 0.5) + 1) — always positive; the tf
    saturation uses the standard (k1, b) length normalization against
    avgdl. Per-term contributions and the final score are rounded to
    ``dp`` so an independent engine replays bit-identically.

    Scale shape: one token explode feeds the (doc, term) tf aggregate;
    doc length is a second aggregate of the same token stream (both
    map-side combined); df and the (N, avgdl) scalars are aggregates of
    the already-small tf frame and broadcast. Only rows for the handful
    of query terms survive past the tf filter, so the scoring join is
    query-sized, not corpus-sized — and nothing rescans the corpus.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    qtf = tf.filter(F.col("term").isin(query_terms))
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        qtf.join(dfreq, "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.round(
                F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                dp,
            ),
        )
    )
    scored = contrib.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.sum("contrib"), dp).alias("score"),
    )
    # top-k as TakeOrderedAndProject (per-partition heaps, no global
    # sort), THEN a window over the k-row survivor frame for the rank —
    # an unpartitioned row_number over the full match set would funnel
    # every matching doc through one task at corpus scale.
    top = scored.orderBy(F.col("score").desc(), F.col("doc")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc", "n_terms", "score", "rank"
    )


def top_terms_per_doc(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF (ties broken by
    term for determinism)."""
    from pyspark.sql.window import Window

    scored = tfidf_terms(df, text_col, id_col)
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc", "term", "tfidf", "rank")
    )
