"""Heavy-basket id-cap probe (round-9 task: BASELINE.md miner-surgery
note said the cap "is the insurance that heavy-basket data cannot go
quadratic" — argued, not measured; this measures it).

Synthesizes retail-cart-shaped baskets — every basket holds ``mean_sz``
distinct items (+-50% deterministic jitter), far beyond TPC-H's <=7 —
and times association_rules' two plans over a basket-size sweep at a
FIXED basket count:

- uncapped (max_basket_items=None): pair volume per basket is
  s*(s-1)/2 — doubling basket size ~4x's the exploded pair frame, the
  quadratic the cap exists to bound;
- capped (rank_by='id', max_basket_items=5): pair volume per basket is
  C(5,2)=10 regardless of s — the exploded frame stays flat and only
  the linear marginals grow.

The basket-size axis (not basket count) isolates the claim: both plans
are linear in baskets; only the uncapped one is quadratic in basket
size. Items are drawn from a 10k catalog with per-basket stride mixing
so pair keys are mostly distinct (the worst case for map-side combine,
same regime as the sf10 profile in BASELINE.md).

Usage: python tools/basket_probe.py [n_baskets] [sizes_csv]
Defaults: 2000 50,100,200,400. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.operators.behavior import association_rules
from stockpy_spark.session import get_spark

CATALOG = 10_000


def make_baskets(spark, n_baskets: int, mean_sz: int):
    """(basket_id, item_id) rows: basket b holds sz(b) distinct items
    at stride b%7+1 from offset b*31 — deterministic, catalog-mixing."""
    b = F.col("id")
    sz = (F.lit(mean_sz / 2).cast("int") + (b * 97) % F.lit(mean_sz)).cast("int")
    return (
        spark.range(n_baskets)
        .select(
            b.alias("basket_id"),
            F.explode(F.sequence(F.lit(0), sz - 1)).alias("j"),
        )
        .select(
            "basket_id",
            (
                (
                    F.col("basket_id") * 31
                    + F.col("j") * ((F.col("basket_id") % 7) + 1)
                )
                % CATALOG
            ).alias("item_id"),
        )
    )


def timed(df) -> tuple[float, int]:
    best, n = float("inf"), 0
    for _ in range(2):  # warmed best-of-2, like bench.py
        t0 = time.time()
        n = df.count()
        best = min(best, time.time() - t0)
    return round(best, 2), n


def main() -> None:
    n_baskets = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sizes = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [50, 100, 200, 400]
    )
    spark = get_spark("basket_probe")
    out = {"n_baskets": n_baskets, "sweep": []}
    for mean_sz in sizes:
        # materialize once so the sweep times the miners, not the gen
        baskets = make_baskets(spark, n_baskets, mean_sz).localCheckpoint()
        uncapped_s, uncapped_rows = timed(
            association_rules(baskets, "basket_id", "item_id", min_co=3)
        )
        capped_s, capped_rows = timed(
            association_rules(
                baskets,
                "basket_id",
                "item_id",
                min_co=3,
                max_basket_items=5,
                rank_by="id",
            )
        )
        out["sweep"].append(
            {
                "mean_basket_items": mean_sz,
                "uncapped_sec": uncapped_s,
                "uncapped_rules": uncapped_rows,
                "capped_sec": capped_s,
                "capped_rules": capped_rows,
            }
        )
    first, last = out["sweep"][0], out["sweep"][-1]
    growth = sizes[-1] / sizes[0]
    out["size_growth"] = growth
    out["uncapped_time_ratio"] = round(
        last["uncapped_sec"] / max(first["uncapped_sec"], 1e-9), 2
    )
    out["capped_time_ratio"] = round(
        last["capped_sec"] / max(first["capped_sec"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
