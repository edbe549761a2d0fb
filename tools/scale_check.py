"""Sub-linearity regression gate (BASELINE.md §3, round-3 task 4).

Runs the bench HEADLINE queries at sf0.1 and at a synthetic 10x
(built by tools/scale_up.py into .scratch_sf1) in ONE Spark session,
then FAILS (exit 1) if any query's 10x-data time exceeds
``RATIO_LIMIT`` x its sf0.1 time — with a noise floor so a 0.2 s query
jittering to 1.2 s doesn't page anyone. This turns the one-off sf1
spot-check (which found the driver-memory auto-broadcast OOM fixed in
session.py:66) into a repeatable gate: a plan regression that breaks
sub-linear scaling (lost broadcast, lost partial agg, pair-enumeration
dedup) shows up here as a ratio blowout long before a cluster run.

Usage: python tools/scale_check.py [--rebuild] [query ...]
  --rebuild  force re-synthesis of .scratch_sf1 even if present
  query ...  check only these HEADLINE names (default: all)

Prints one JSON line: {"pass": bool, "worst": name, "ratios": {...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from stockpy_spark.registry import QUERIES  # noqa: E402
from stockpy_spark.session import get_spark  # noqa: E402

BASE_DIR = "/root/testdata/sf0.1"
SCALED_DIR = "/root/repo/.scratch_sf1"
FACTOR = 10
# Allowed wall-time growth for FACTOR x data. Perfectly linear would be
# ~FACTOR at constant parallelism; on local[32] the sf0.1 runs leave
# cores idle, so healthy queries land near 1-4x. 5.0 catches a plan
# regression (quadratic candidate growth, lost broadcast) while
# tolerating the shuffle-bound fact queries' honest data growth.
RATIO_LIMIT = 5.0
NOISE_FLOOR_SEC = 1.0  # sub-second queries: absolute, not relative

# Documented saturation-linear per-row-CPU exceptions used to live
# here (text_gopher_repetition at 9.0 — its interpreted-HOF path
# measured 6.24 in the r11 full gate). The r13/r14 Arrow kernels
# cured the class: gopher now gates at 1.59, lm 1.45, kn 2.95, dsir
# 1.45 (r14 full-gate run, BASELINE.md), so every query sits under
# the common 5.0 limit and the exception list is EMPTY — a new entry
# here needs a BASELINE.md attribution first.
PER_QUERY_LIMIT: dict[str, float] = {}


def _time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    return timings


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--rebuild"]
    rebuild = "--rebuild" in sys.argv[1:]
    names = [n for n in (args or HEADLINE) if n in QUERIES]

    if rebuild or not os.path.isdir(SCALED_DIR):
        subprocess.run(
            [sys.executable, "tools/scale_up.py", str(FACTOR), BASE_DIR, SCALED_DIR],
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )

    spark = get_spark("scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both datasets' first-touch (nanos-timestamp fallback, FS cache)
    from stockpy_spark.sources.testdata import read_events

    for d in (BASE_DIR, SCALED_DIR):
        read_events(spark, d).count()

    base = _time_queries(spark, BASE_DIR, names)
    scaled = _time_queries(spark, SCALED_DIR, names)

    ratios, failures = {}, []
    for name in names:
        limit = max(
            PER_QUERY_LIMIT.get(name, RATIO_LIMIT) * base[name],
            NOISE_FLOOR_SEC,
        )
        ratios[name] = round(scaled[name] / max(base[name], 1e-9), 2)
        if scaled[name] > limit:
            failures.append(name)

    worst = max(names, key=lambda n: ratios[n])
    print(
        json.dumps(
            {
                "pass": not failures,
                "factor": FACTOR,
                "ratio_limit": RATIO_LIMIT,
                "total_base_sec": round(sum(base.values()), 3),
                "total_scaled_sec": round(sum(scaled.values()), 3),
                "worst": worst,
                "worst_ratio": ratios[worst],
                "failures": failures,
                "ratios": ratios,
                "base": base,
                "scaled": scaled,
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
