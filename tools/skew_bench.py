"""Skew-robustness evidence for salted_join (round-3 task 5).

Builds a pathologically skewed join at synthetic-sf1 scale — N fact
rows, 90% sharing ONE key, joined to a 1 000-row dim — and times three
physical strategies in one session:

  plain_aqe    : df.join with AQE skew-join splitting ON (the default)
  plain_noaqe  : df.join with AQE skew handling OFF (what a naive
                 engine, or Spark <3.0, would do)
  salted_8/32  : operators.joins.salted_join with 8 / 32 buckets

The fact side is generated with a deterministic content-derived skew
(id-based, no rand()), matching salted_join's determinism rules. The
join output is reduced with a count + sum so the full join materializes
but nothing lands on the driver.

Usage: python tools/skew_bench.py [n_rows] (default 5_000_000)
Prints one JSON line with seconds per strategy; paste the numbers into
salted_join's docstring when they change materially.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.operators.joins import salted_join
from stockpy_spark.session import get_spark

HOT_SHARE = 0.9
N_KEYS = 1_000


def build(spark, n_rows: int):
    """90% of rows carry key 0; the rest spread over N_KEYS-1 keys.
    A payload column distinguishes hot rows so the content-derived salt
    can spread them (see salted_join's identical-clones caveat)."""
    facts = spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 10 * HOT_SHARE, F.lit(0))
        .otherwise(F.col("id") % N_KEYS)
        .cast("long")
        .alias("k"),
        (F.col("id") * 7 % 1_000_003).alias("payload"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 97).alias("weight")
    )
    return facts, dim


def run(spark, facts, dim, strategy: str) -> float:
    t0 = time.time()
    if strategy == "plain":
        joined = facts.join(dim, "k", "inner")
    elif strategy.startswith("salted_"):
        buckets = int(strategy.split("_")[1])
        joined = salted_join(
            facts, dim, "k", salt_buckets=buckets, salt_cols=["payload"]
        )
    else:
        raise ValueError(strategy)
    joined.agg(
        F.count("*").alias("n"), F.sum(F.col("payload") * F.col("weight"))
    ).collect()
    return round(time.time() - t0, 3)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Skew only exists on a SHUFFLED join: a KB-sized dim would
    # auto-broadcast and dissolve the hot key map-side. Disabling
    # auto-broadcast simulates the case salting is for — a right side
    # too big to broadcast (or a fact-fact join) over a skewed key.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    facts, dim = build(spark, n_rows)
    facts.count()  # warm

    out: dict[str, float] = {"n_rows": n_rows, "hot_share": HOT_SHARE}
    for label, skew_conf in (("plain_aqe", "true"), ("plain_noaqe", "false")):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_conf)
        best = min(run(spark, facts, dim, "plain") for _ in range(2))
        out[label] = best
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    for buckets in (8, 32):
        best = min(run(spark, facts, dim, f"salted_{buckets}") for _ in range(2))
        out[f"salted_{buckets}"] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
