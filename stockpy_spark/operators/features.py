"""Feature-engineering transforms for training-data pipelines.

Numeric featurization steps that need a corpus statistic (quantile
boundaries) follow the same two-phase shape as the robust-clip and
histogram ops: ONE tiny aggregate produces the statistic, a broadcast
carries it back, and the per-row transform is a narrow builtin
expression — no UDFs, no second scan, rerun-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bucketize(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    out_col: str = "bin",
    decimals: int = 6,
) -> DataFrame:
    """Bin ``value_col`` by its own EXACT quantile boundaries: bin =
    number of boundaries <= value, in [0, len(probs)] (quartiles by
    default). The spark.ml Bucketizer needs caller-supplied splits;
    this derives them from the data in one aggregate and keeps
    everything an expression.

    Exact ``percentile`` (not approx_percentile) so the boundaries are
    engine-reproducible; they are rounded to ``decimals`` BEFORE the
    comparison so every engine bins against the same literal — the
    sort-based exact percentile is a heavier aggregate than a sketch,
    which is the price of determinism (swap in approx_percentile when
    binning 100 TB and bit-stability across engines isn't required).
    NULL values get a NULL bin (an SQL twin must carry the same CASE —
    a bare ``len(list_filter(...))`` would yield bin 0 for NULLs).
    """
    plist = ", ".join(repr(float(p)) for p in probs)
    qcol = f"`{value_col}`"  # survive names needing quoting in expr()
    bounds = df.agg(
        F.transform(
            F.expr(f"percentile({qcol}, array({plist}))"),
            lambda b: F.round(b, decimals),
        ).alias("__bs")
    )
    bin_expr = F.when(
        F.col(value_col).isNotNull(),
        F.aggregate(
            F.col("__bs"),
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(value_col) >= b, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, bin_expr)
        .drop("__bs")
    )
