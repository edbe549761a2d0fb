"""Z-order data-skipping probe (BASELINE.md §4).

Writes the sf1 events table (a) sorted by user_id alone and (b)
Z-ordered on (user_id, value), then measures what data skipping
actually gets: per-file min/max spans per dimension, and the wall time
+ files-read of a two-sided predicate
(user_id BETWEEN ... AND value BETWEEN ...) against each layout.

Usage: python tools/zorder_probe.py [sf_dir] [n_files]
Defaults: /root/repo/.scratch_sf1 32. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.operators.layout import measure_file_spans, write_zordered, zorder_key
from stockpy_spark.session import get_spark
from stockpy_spark.sources.testdata import read_events


def mean_spans(spark, path: str, cols: list[str]) -> dict[str, float]:
    rows = measure_file_spans(spark, path, cols).collect()
    return {
        c: round(sum(r[f"span_{c}"] for r in rows) / len(rows), 3) for c in cols
    }


def timed_filter(spark, path: str) -> tuple[float, int]:
    df = spark.read.parquet(path)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        n = df.where(
            (F.col("user_id").between(100, 200))
            & (F.col("value").between(10.0, 20.0))
        ).count()
        best = min(best, time.time() - t0)
    return round(best, 3), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch_sf1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("zorder_probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")

    base = "/root/repo/.scratch_zorder"
    shutil.rmtree(base, ignore_errors=True)
    single, z = f"{base}/single", f"{base}/z"
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(single)
    )
    write_zordered(ev, z, ["user_id", "value"], n_files=n_files)

    cols = ["user_id", "value"]
    s_time, s_n = timed_filter(spark, single)
    z_time, z_n = timed_filter(spark, z)
    out = {
        "n_rows": ev.count(),
        "n_files": n_files,
        "single_sort_mean_spans": mean_spans(spark, single, cols),
        "zorder_mean_spans": mean_spans(spark, z, cols),
        "filter_sec_single": s_time,
        "filter_sec_zorder": z_time,
        "rows_match": s_n == z_n,
    }
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
