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
