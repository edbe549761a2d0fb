"""Two-decade scale spots for named queries: run each at sf0.1, the
synthetic sf1, and the synthetic sf10 (tools/scale_up.py outputs) in
ONE Spark session, warmed best-of-2 per (query, sf), and print a
markdown table row per query — the numbers recorded in BASELINE.md §4.

Usage: python tools/family_spots.py q1 [q2 ...]
       python tools/family_spots.py --sfs sf0.1,sf1 q1 ...   # subset of decades
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stockpy_spark.registry import QUERIES  # noqa: E402
from stockpy_spark.session import get_spark  # noqa: E402

DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scratch_sf1",
    "sf10": "/root/repo/.scratch_sf10",
}


def main() -> None:
    args = sys.argv[1:]
    sfs = list(DIRS)
    if args and args[0] == "--sfs":
        sfs = args[1].split(",")
        args = args[2:]
    names = args
    spark = get_spark("family_spots")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf in sfs:
        d = DIRS[sf]
        if not os.path.isdir(d):
            print(f"skip {sf}: {d} missing", file=sys.stderr)
            continue
        for n in names:
            best = None
            for _ in range(2):
                t0 = time.time()
                # noop sink: full execution, zero driver transfer (a
                # collect() of a wide result at sf10 can exceed
                # spark.driver.maxResultSize and would time serialization,
                # not the query)
                QUERIES[n](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[n][sf] = best
            print(f"  {n} @ {sf}: {best:.2f}s", file=sys.stderr)
    print("| Query | " + " | ".join(sfs) + " | 100x ratio |")
    print("|---|" + "---|" * (len(sfs) + 1))
    for n in names:
        r = results[n]
        cells = " | ".join(f"{r[sf]:.2f} s" if sf in r else "—" for sf in sfs)
        ratio = (
            f"{r['sf10'] / r['sf0.1']:.1f}x"
            if "sf10" in r and "sf0.1" in r and r["sf0.1"] > 0
            else "—"
        )
        print(f"| `{n}` | {cells} | {ratio} |")


if __name__ == "__main__":
    main()
