"""sample_dsir_weights cost attribution (r13 judge item #3).

Times each structural slice of dsir_importance_weights at a chosen SF
(default the synthetic sf1), warmed best-of-2, to attribute the
headline cost between (a) the bigram explode volume, (b) the md5
bucket hash, (c) the conditional bucket aggregate, and (d) the
per-doc scoring join+sum — and runs an Arrow-kernel prototype of the
explode+bucket stage (per-doc Counter over bucket ids, the
bigram_stats_kernel treatment) to decide whether the expression path
is interpreted-HOF-bound or genuinely volume-bound.

Usage: python tools/dsir_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stockpy_spark.session import get_spark  # noqa: E402


def timed(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:<42} {best:7.2f} s")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch_sf1"
    spark = get_spark("dsir_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm

    from stockpy_spark.functions.text import word_ngrams
    from stockpy_spark.operators.dsir import (
        _bucket,
        dsir_bucket_doc_counts,
        dsir_bucket_partials,
        dsir_importance_weights,
    )

    is_target = F.col("doc_id") % 10 == 0
    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    tagged = docs.select(
        F.col("doc_id").alias("__id"),
        is_target.alias("__tgt"),
        F.col("text").alias("__txt"),
    )
    grams_only = tagged.select(
        "__id", "__tgt", F.explode_outer(word_ngrams("__txt", 2)).alias("__gram")
    )
    grams_bucketed = grams_only.select(
        "__id",
        "__tgt",
        F.when(
            F.col("__gram").isNotNull(), _bucket(F.col("__gram"), 1024, "dsir")
        ).alias("__b"),
    )
    stats = grams_bucketed.filter(F.col("__b").isNotNull()).groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__ct"),
        F.sum(F.when(~F.col("__tgt"), 1).otherwise(0)).alias("__cr"),
    )

    timed("full dsir (expression path)", lambda: noop(
        dsir_importance_weights(docs, "text", "doc_id", is_target, use_kernel=False)
    ))
    timed("full dsir (kernel path)", lambda: noop(
        dsir_importance_weights(docs, "text", "doc_id", is_target, use_kernel=True)
    ))
    timed("explode only (word_ngrams)", lambda: noop(grams_only))
    timed("explode + md5 bucket", lambda: noop(grams_bucketed))
    timed("explode + bucket + conditional agg", lambda: noop(stats))
    timed("KERNEL: per-doc bucket counts (raw only)", lambda: noop(
        dsir_bucket_doc_counts(docs, "text", "doc_id", is_target, 1024, "dsir")
    ))
    timed("KERNEL: partition partials -> cond agg", lambda: noop(
        dsir_bucket_partials(docs, "text", is_target, 1024, "dsir")
        .groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__tgt"), F.col("__cnt")).otherwise(0)).alias("__ct"),
            F.sum(F.when(~F.col("__tgt"), F.col("__cnt")).otherwise(0)).alias("__cr"),
        )
    ))


if __name__ == "__main__":
    main()
