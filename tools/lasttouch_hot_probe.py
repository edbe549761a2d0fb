"""Last-touch hot-user (bot) probe (round-11 task: BASELINE.md §4).

Before the round-11 rewrite, last_touch_attribution joined conversions
x touches per user and band-filtered AFTER — a bot emitting k events
paid O(k^2) pair evaluations. The as-of/LOCF rewrite is one (user,
ts) window with a carried last-touch struct: a hot user costs one
per-user sort, linear-ish in k, never quadratic. The probe
synthesizes ``hot_frac`` of n events on ONE user (every 10th event a
conversion, the rest touches) vs a uniform 1000-events-per-user
stream, and compares wall-clock — the old plan's hot case would grow
with (hot_frac * n)^2 / 100; the window plan's stays near the uniform
time.

Usage: python tools/lasttouch_hot_probe.py [n] [hot_frac]
Defaults: 6_000_000 0.9. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.operators.behavior import last_touch_attribution
from stockpy_spark.session import get_spark


def synth_events(spark, n: int, hot_frac: float):
    hot = int(n * hot_frac)
    user = F.when(F.col("id") < hot, F.lit(0)).otherwise(
        (F.col("id") / 1000).cast("long")
    )
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        user.alias("user_id"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
        F.when(F.col("id") % 10 == 9, F.lit("purchase"))
        .otherwise(F.lit("view"))
        .alias("event_type"),
    )


def run_attr(events) -> tuple[float, int]:
    t0 = time.time()
    out = last_touch_attribution(events, ["view"], "purchase", 3600)
    n_attr = out.where(F.col("touch_type").isNotNull()).count()
    return time.time() - t0, n_attr


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark("lasttouch_hot_probe")
    spark.sparkContext.setLogLevel("ERROR")

    run_attr(synth_events(spark, 50_000, hot_frac))  # warm codegen

    skew_s, skew_attr = run_attr(synth_events(spark, n, hot_frac))
    unif_s, unif_attr = run_attr(synth_events(spark, n, 0.0))

    # every conversion has a view 1s before it, so all are attributed
    expected = n // 10
    print(
        json.dumps(
            {
                "n": n,
                "hot_frac": hot_frac,
                "skewed_sec": round(skew_s, 2),
                "uniform_sec": round(unif_s, 2),
                "skew_over_uniform": round(skew_s / unif_s, 2),
                "skewed_attributed": skew_attr,
                "attributed_correct": skew_attr == expected,
                "uniform_attributed": unif_attr,
            }
        )
    )


if __name__ == "__main__":
    main()
