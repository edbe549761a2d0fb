"""Generic per-stage attribution for any registered query: run the
query (noop sink) once warm + once measured, then dump every stage the
measured run executed — wall (completion-submission), executor task
time, task count, input/shuffle bytes — from the in-process
AppStatusStore. This is the empirical half of guide §1: it tells you
whether a query's wall is one fat single-task stage (serialized CPU),
many tiny stages (scheduler/job overhead), or a genuine shuffle.

Usage: python tools/stage_probe.py <query> [query ...]
       SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from stockpy_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "stage_probe", extra_conf={"spark.ui.retainedStages": "100000"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stockpy_spark.registry import QUERIES

    # warm scans + JVM
    QUERIES["a2_count_star"](spark, sf_dir).collect()

    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()

    def stages():
        lst = store.stageList(
            empty,
            *[getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        )
        out = {}
        for i in range(lst.size()):
            sd = lst.apply(i)
            out[(sd.stageId(), sd.attemptId())] = sd
        return out

    for name in names:
        # warm run (plan compilation, broadcast warmup)
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        seen = set(stages().keys())
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        rows = []
        for key, sd in stages().items():
            if key in seen:
                continue
            sub = sd.submissionTime()
            com = sd.completionTime()
            stage_wall = 0.0
            if sub.nonEmpty() and com.nonEmpty():
                stage_wall = (
                    com.get().getTime() - sub.get().getTime()
                ) / 1000.0
            rows.append(
                (
                    key[0],
                    stage_wall,
                    sd.executorRunTime() / 1000.0,
                    sd.numCompleteTasks(),
                    sd.inputBytes() / 1e6,
                    sd.shuffleReadBytes() / 1e6,
                    sd.shuffleWriteBytes() / 1e6,
                    (sd.description().get() if sd.description().nonEmpty()
                     else sd.name())[:90],
                )
            )
        rows.sort(key=lambda r: -r[1])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(rows)} stages ===")
        print(f"{'stage':>6} {'wall_s':>7} {'task_s':>7} {'tasks':>5} "
              f"{'in_MB':>7} {'shR_MB':>7} {'shW_MB':>7}  name")
        for r in rows:
            print(
                f"{r[0]:>6} {r[1]:>7.2f} {r[2]:>7.2f} {r[3]:>5} "
                f"{r[4]:>7.2f} {r[5]:>7.2f} {r[6]:>7.2f}  {r[7]}"
            )
        tot_wall = sum(r[1] for r in rows)
        print(f"sum(stage wall)={tot_wall:.2f}s vs query wall {wall:.3f}s "
              f"(gap = driver/plan/scheduling)")


if __name__ == "__main__":
    main()
