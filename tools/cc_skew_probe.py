"""CC hot-bucket skew probe (round-6 task: BASELINE.md §4).

A boilerplate-heavy corpus puts a large fraction of documents into ONE
LSH bucket in every band. The probe synthesizes that adversarial shape —
``dup_frac`` of n docs share byte-identical text, the rest are unique —
and runs the scale-path composition (minhash_lsh_star_edges ->
dedup_components -> representative count) against a uniform corpus of
the same size, to answer: does the hot (band, bsig) key need salting,
or do the existing plan shapes absorb it?

Why the hot key is structurally benign here (the probe verifies the
argument with numbers):

- the bucket-min agg is a map-side-combined ``min`` — the hot bucket
  reduces to one row per task before the shuffle;
- the bucket join's build side (bucket_min) is one row per bucket,
  so Spark broadcasts it and the hot key never routes through a
  single reducer;
- the star-edge ``distinct`` keys are (d1, d2) PAIRS — unique per
  member, so dup-heavy corpora spread, not concentrate;
- in CC propagation the hot star center receives 0.9n neighbor-min
  rows, again min-combined map-side.

Usage: python tools/cc_skew_probe.py [n_docs] [dup_frac]
Defaults: 1_000_000 0.9. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.operators.dedup import minhash_lsh_star_edges
from stockpy_spark.operators.graph import dedup_components
from stockpy_spark.session import get_spark


def synth_corpus(spark, n: int, dup_frac: float):
    """n docs; the first ``dup_frac`` share one byte-identical
    boilerplate text (=> same minhash signature => same bucket in every
    band), the rest are per-id unique."""
    boiler = (
        "terms of service apply to all content on this page please read "
        "carefully before proceeding all rights reserved contact support"
    )
    # unique docs get 8 tokens carved out of a per-id sha256 — token
    # sets are pairwise (near-)disjoint, so LSH bucket collisions among
    # them are negligible and the expected component structure is
    # exactly (1 boilerplate cluster + singletons)
    h = F.sha2(F.concat(F.lit("doc-"), F.col("id").cast("string")), 256)
    unique_text = F.concat_ws(
        " ", *[F.substring(h, 1 + 8 * i, 8) for i in range(8)]
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < int(n * dup_frac), F.lit(boiler))
        .otherwise(unique_text)
        .alias("text"),
    )


def run_pipeline(docs) -> tuple[float, int]:
    t0 = time.time()
    pairs = minhash_lsh_star_edges(docs, "text", "doc_id", num_hashes=12, bands=2)
    comp = dedup_components(docs.select("doc_id"), pairs)
    n_reps = comp.where(F.col("is_representative")).count()
    return time.time() - t0, n_reps


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark("cc_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM so the comparison isn't codegen-skewed
    run_pipeline(synth_corpus(spark, 50_000, dup_frac))

    skew_s, skew_reps = run_pipeline(synth_corpus(spark, n, dup_frac))
    unif_s, unif_reps = run_pipeline(synth_corpus(spark, n, 0.0))

    expected_reps = n - int(n * dup_frac) + 1  # uniques + 1 boilerplate rep
    print(
        json.dumps(
            {
                "n_docs": n,
                "dup_frac": dup_frac,
                "skewed_sec": round(skew_s, 2),
                "uniform_sec": round(unif_s, 2),
                "skew_over_uniform": round(skew_s / unif_s, 2),
                "skewed_reps": skew_reps,
                "reps_correct": skew_reps == expected_reps,
                "uniform_reps": unif_reps,
            }
        )
    )


if __name__ == "__main__":
    main()
