"""Per-query shuffle-write-byte probe: bench.py's ledger delta for the
named queries, in isolation (warm session, best-of-2 structure — the
delta over the LAST run, exactly as bench.py records it), printed per
run so run-to-run byte wobble is visible.

Usage: python tools/shuffle_probe.py [-r ROUNDS] q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from stockpy_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    rounds = 3
    if args and args[0] == "-r":
        rounds = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "shuffle_probe", extra_conf={"spark.ui.retainedStages": "100000"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stockpy_spark.registry import QUERIES

    QUERIES["a2_count_star"](spark, sf_dir).collect()

    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()

    def shuffle_total() -> int:
        # drain the async listener bus so late-posting stage metrics
        # from a prior run cannot leak into this bracket (bench.py r16
        # measurement fix)
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        stages = store.stageList(
            empty,
            *[getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        )
        return sum(
            stages.apply(i).shuffleWriteBytes() for i in range(stages.size())
        )

    for name in args:
        deltas = []
        for i in range(rounds):
            w0 = shuffle_total()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            deltas.append((shuffle_total() - w0, wall))
        print(
            f"{name}: "
            + "  ".join(f"{d/1e6:.3f}MB/{w:.2f}s" for d, w in deltas)
        )


if __name__ == "__main__":
    main()
