"""Domain-cap hot-domain skew probe (round-11 task: BASELINE.md §4).

A mega-site holding a large fraction of a crawl is EXACTLY the row
class domain_diversity_cap exists to discard — and, before the
round-11 rewrite, exactly the rows it paid a per-domain single-task
WindowExec sort for (a 1%-of-100TB domain = ~1 TB through one
sorter). The bucketed-rank rewrite splits every domain into draw-range
slices ranked locally, so the hot domain spreads across n_buckets
tasks. The probe synthesizes the adversarial shape — ``skew_frac`` of
n URLs on ONE registrable domain, the rest on 1000-row domains — and
compares wall-clock against a uniform corpus of the same size,
verifying both the ~1x ratio and the exact kept counts.

Usage: python tools/domcap_skew_probe.py [n] [skew_frac] [cap]
Defaults: 6_000_000 0.9 100. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.operators.webfilter import (
    blocklist_screen,
    domain_diversity_cap,
)
from stockpy_spark.session import get_spark


def synth_urls(spark, n: int, skew_frac: float):
    """n URLs; the first ``skew_frac`` share one registrable domain,
    the rest spread over 1000-row domains (site<k>.com)."""
    hot = int(n * skew_frac)
    dom = F.when(
        F.col("id") < hot, F.lit("megadomain.com")
    ).otherwise(F.concat(F.lit("site"), (F.col("id") / 1000).cast("long"), F.lit(".com")))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://"), dom, F.lit("/p"), F.col("id")).alias("url"),
    )


def run_cap(docs, cap: int) -> tuple[float, int]:
    t0 = time.time()
    out = domain_diversity_cap(
        blocklist_screen(docs, "url", ["blockedsite.com"]), "doc_id", cap
    )
    n_kept = int(out.agg(F.sum("kept")).collect()[0][0])
    return time.time() - t0, n_kept


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    skew_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    spark = get_spark("domcap_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    run_cap(synth_urls(spark, 50_000, skew_frac), cap)  # warm codegen

    skew_s, skew_kept = run_cap(synth_urls(spark, n, skew_frac), cap)
    unif_s, unif_kept = run_cap(synth_urls(spark, n, 0.0), cap)

    hot = int(n * skew_frac)
    # hot domain keeps cap; every full 1000-row domain keeps cap (cap
    # <= 1000), the trailing partial domain keeps min(size, cap)
    rest = n - hot
    full, tail = divmod(rest, 1000)
    expected = cap + full * min(cap, 1000) + min(tail, cap)
    print(
        json.dumps(
            {
                "n": n,
                "skew_frac": skew_frac,
                "cap": cap,
                "skewed_sec": round(skew_s, 2),
                "uniform_sec": round(unif_s, 2),
                "skew_over_uniform": round(skew_s / unif_s, 2),
                "skewed_kept": skew_kept,
                "kept_correct": skew_kept == expected,
                "uniform_kept": unif_kept,
            }
        )
    )


if __name__ == "__main__":
    main()
