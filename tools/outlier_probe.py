"""Value-outlier adversarial probe for the bucketed prefix-sum family
(round-12 task: BASELINE.md §4).

The round-11 verdict's systemic finding: the family's equal-width
(min, max) bucket edges collapse under ONE extreme value — a sentinel
price, an epoch-0 timestamp — flooring ~every row into bucket 0 and
degenerating the per-bucket window back into the single-task corpus
sort the pattern exists to kill. The existing skew battery
(cc_skew_probe, domcap_skew_probe, lasttouch_hot_probe) tests KEY skew
and uniform hash draws; this probe tests the VALUE axis: for each
operator it synthesizes a fixed-size frame in two variants — uniform
draws, and the same draws with ONE row at 1e12 (1e18 for the time
axis) — times both, and asserts the outlier variant's output is
INVARIANT to the bucket count (n_buckets=default vs n_buckets=4),
the family's core output-invariance contract, on the adversarial
input itself.

With the round-12 equal-frequency quantile edges
(operators/bucketing.py) the ratio reads ~1x; the old equal-width
edges concentrated the entire frame into one window task.

Usage: python tools/outlier_probe.py [n] [op ...]
Defaults: n=2_000_000, all of: ks spearman gini pareto concurrency.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from stockpy_spark.session import get_spark

OUTLIER = 1.0e12
T_OUTLIER = 1.0e18


def draw(col, salt: str):
    """Deterministic uniform [0, 1) from a hash — F.rand re-evaluates
    per action and would break the cross-plan equality asserts."""
    return (
        F.pmod(F.xxhash64(col.cast("string"), F.lit(salt)), F.lit(1_000_000))
        / 1_000_000.0
    )


def base(spark, n: int):
    return spark.range(n)


def with_outlier(v, outlier: float):
    return F.when(F.col("id") == 0, F.lit(outlier)).otherwise(v)


def rows_sorted(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def timed(fn) -> tuple[float, object]:
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def probe_ks(spark, n: int):
    from stockpy_spark.operators.drift import ks_2samp

    def mk(outlier: bool):
        v = draw(F.col("id"), "ks")
        if outlier:
            v = with_outlier(v, OUTLIER)
        ref = base(spark, n).select(v.alias("v"))
        cur = base(spark, n).select(
            (draw(F.col("id"), "ks2") * 0.9 + 0.1).alias("v")
        )
        return ref, cur

    def run(outlier: bool, n_buckets: int = 64):
        ref, cur = mk(outlier)
        return rows_sorted(ks_2samp(ref, cur, "v", n_buckets=n_buckets))

    return run


def probe_spearman(spark, n: int):
    from stockpy_spark.operators.stats import spearman_corr_pairs

    def run(outlier: bool, n_buckets: int = 256):
        x = draw(F.col("id"), "sx") + F.col("id") * 1e-9  # near-distinct
        if outlier:
            x = with_outlier(x, OUTLIER)
        df = base(spark, n).select(
            x.alias("x"),
            (x * 0.5 + draw(F.col("id"), "sy")).alias("y"),
        )
        return rows_sorted(
            spearman_corr_pairs(df, ["x", "y"], n_buckets=n_buckets)
        )

    return run


def probe_gini(spark, n: int):
    from stockpy_spark.operators.stats import gini_by_group

    def run(outlier: bool, n_buckets: int = 64):
        v = draw(F.col("id"), "g") * 1000.0
        if outlier:
            v = with_outlier(v, OUTLIER)
        df = base(spark, n).select(
            (F.col("id") % 4).alias("grp"), v.alias("x")
        )
        return rows_sorted(gini_by_group(df, "grp", "x", n_buckets=n_buckets))

    return run


def probe_pareto(spark, n: int):
    from stockpy_spark.operators.skyline import pareto_frontier_2d

    def run(outlier: bool, n_buckets: int = 64):
        x = draw(F.col("id"), "px") + F.col("id") * 1e-9
        if outlier:
            x = with_outlier(x, OUTLIER)
        df = base(spark, n).select(
            x.alias("x"), draw(F.col("id"), "py").alias("y")
        )
        return rows_sorted(pareto_frontier_2d(df, "x", "y", n_buckets))

    return run


def probe_concurrency(spark, n: int):
    from stockpy_spark.operators.timeseries import interval_concurrency

    def run(outlier: bool, n_buckets: int = 64):
        s = draw(F.col("id"), "cs") * 1e6
        if outlier:
            s = with_outlier(s, T_OUTLIER)
        df = base(spark, n).select(
            (F.col("id") % 5).cast("string").alias("k"),
            s.alias("s"),
            (s + 1000.0).alias("e"),
        )
        out = interval_concurrency(df, "s", "e", ["k"], n_buckets)
        # 2n-row output: digest instead of collect
        dig = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("concurrent").alias("sum_c"),
            F.max("concurrent").alias("max_c"),
        ).collect()[0]
        return [tuple(dig)]

    return run


def probe_pack(spark, n: int):
    """pack_chunks_ordered (7th family member, r13 probe wiring): the
    order axis is the (doc, chunk) id space — the adversarial input
    is ONE doc id at 1e12, which floods an equal-width doc census's
    top bucket. Output digest = order-insensitive hash-sum over every
    (doc, chunk, seq_start, bin) row, so any single-row divergence
    between bucket plans is caught without collecting n rows."""
    from stockpy_spark.operators.sampling import pack_chunks_ordered

    def run(outlier: bool, n_buckets: int = 256):
        doc = (F.col("id") / F.lit(3)).cast("long").cast("double")
        if outlier:
            doc = F.when(F.col("id") < 3, F.lit(OUTLIER)).otherwise(doc)
        df = base(spark, n).select(
            doc.alias("doc"),
            (F.col("id") % 3).alias("chunk"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(90)) + 10).alias("tok"),
        )
        out = pack_chunks_ordered(df, "doc", "chunk", "tok", 4096, n_buckets)
        dig = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.pmod(
                    F.xxhash64(
                        F.col("doc").cast("string"), F.col("chunk"),
                        F.col("seq_start"), F.col("bin"),
                    ),
                    F.lit(1_000_000_007),
                )
            ).alias("hashsum"),
            F.max("seq_start").alias("max_start"),
            F.max("bin").alias("max_bin"),
        ).collect()[0]
        return [tuple(dig)]

    return run


def probe_matched(spark, n: int):
    """matched_controls sub-buckets (r13 probe wiring): the semantic
    tolerance bucket is the caliper, so the adversarial input is the
    docstring's own degeneration — EVERY value inside one tolerance
    width (plus one 1e12 row), which without equal-frequency
    sub-bucketing funnels the whole corpus through one window task.
    Invariance: n_sub_buckets default vs 4 must match row for row."""
    from stockpy_spark.operators.sampling import matched_controls

    def run(outlier: bool, n_buckets: int = 32):
        v = draw(F.col("id"), "mc") * 0.5  # all inside ONE tol bucket
        if outlier:
            v = with_outlier(v, OUTLIER)
        pool = base(spark, n).select(F.col("id").alias("id"), v.alias("v"))
        ev = base(spark, n // 4).select(
            (F.col("id") + n).alias("id"),
            (draw(F.col("id"), "me") * 0.5).alias("v"),
        )
        out = matched_controls(ev, pool, "id", "v", 1000.0, n_buckets)
        dig = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.pmod(
                    F.xxhash64(
                        F.col("eval_id"), F.col("control_id"),
                        F.col("gap").cast("string"),
                    ),
                    F.lit(1_000_000_007),
                )
            ).alias("hashsum"),
            F.count("control_id").alias("matched"),
        ).collect()[0]
        return [tuple(dig)]

    return run


PROBES = {
    "ks": probe_ks,
    "spearman": probe_spearman,
    "gini": probe_gini,
    "pareto": probe_pareto,
    "concurrency": probe_concurrency,
    "pack": probe_pack,
    "matched": probe_matched,
}


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 2_000_000
    ops = [a for a in args if not a.isdigit()] or list(PROBES)
    spark = get_spark("outlier_probe")
    spark.sparkContext.setLogLevel("ERROR")

    report = {"n": n, "ops": {}}
    ok = True
    for op in ops:
        run = PROBES[op](spark, n)
        run(False)  # warm codegen/JIT on the uniform shape
        unif_s, unif_out = timed(lambda: run(False))
        outl_s, outl_out = timed(lambda: run(True))
        # output-invariance on the ADVERSARIAL input: default buckets
        # vs a 4-bucket plan must agree exactly
        coarse = run(True, n_buckets=4)
        invariant = outl_out == coarse
        ok = ok and invariant
        report["ops"][op] = {
            "uniform_s": round(unif_s, 2),
            "outlier_s": round(outl_s, 2),
            "ratio": round(outl_s / unif_s, 2) if unif_s > 0 else None,
            "bucket_invariant": invariant,
        }
    report["all_invariant"] = ok
    print(json.dumps(report))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
