"""One-pass statistical association screens: pairwise Pearson
correlation matrix for numeric columns, and the chi-square /
Cramér's V / mutual-information panel for categorical pairs.

These are the profiling aggregates a feature store or curation
pipeline runs to find redundant features and leaking labels. Both are
ONE full-data aggregate each:

* ``correlation_matrix`` computes every pairwise sum (sx, sxx, sxy) in
  a single map-side-combined aggregate row, then assembles the k*(k-1)/2
  long-form pairs driver-free by exploding a built expression array —
  the data is scanned once regardless of k; no per-pair jobs, no
  ``df.stat.corr`` loop (which scans once PER PAIR).
* ``categorical_association`` reduces to the contingency table (one
  groupBy), then derives marginals, expected counts, chi-square terms,
  and pointwise mutual information with windows over the CELL frame —
  cardinality r*c, KBs — never rescanning the data.

Float determinism: chi-square/MI terms are built from bigint counts
via double arithmetic in the same expression shape the SQL oracle
uses, so per-cell values are ~ulp-identical; only sums over cells and
the correlation sums (different accumulation orders across engines)
rely on the 6-decimal round.

The reference has no statistics beyond plain aggregates; this extends
the profiling surface (quality.py, textstats.py) with the classic
association measures (Cramér 1946; Cover & Thomas ch. 2).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def correlation_matrix(
    df: DataFrame, cols: list[str], dp: int = 6
) -> DataFrame:
    """Long-form Pearson correlation over every unordered column pair.

    Returns (col_x, col_y, n, r) for each pair in ``cols`` order with
    col_x before col_y, r rounded to ``dp``. Rows with a NULL in ANY
    of ``cols`` are excluded (listwise deletion), so every pair shares
    the same n and the matrix is consistent — the semantics a
    downstream PCA/whitening step needs.
    """
    complete = df
    for c in cols:
        complete = complete.filter(F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(F.sum(x).alias(f"s_{c}"))
        aggs.append(F.sum(x * x).alias(f"ss_{c}"))
    for cx, cy in combinations(cols, 2):
        aggs.append(
            F.sum(F.col(cx).cast("double") * F.col(cy).cast("double")).alias(
                f"sp_{cx}_{cy}"
            )
        )
    row = complete.agg(*aggs)
    n = F.col("n").cast("double")
    pairs = F.array(
        *[
            F.struct(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                (
                    (n * F.col(f"sp_{cx}_{cy}") - F.col(f"s_{cx}") * F.col(f"s_{cy}"))
                    / F.sqrt(
                        (n * F.col(f"ss_{cx}") - F.col(f"s_{cx}") * F.col(f"s_{cx}"))
                        * (n * F.col(f"ss_{cy}") - F.col(f"s_{cy}") * F.col(f"s_{cy}"))
                    )
                ).alias("r"),
            )
            for cx, cy in combinations(cols, 2)
        ]
    )
    return row.select(
        F.col("n"), F.explode(pairs).alias("p")
    ).select(
        F.col("p.col_x").alias("col_x"),
        F.col("p.col_y").alias("col_y"),
        "n",
        F.round(F.col("p.r"), dp).alias("r"),
    )


def categorical_association(
    df: DataFrame, col_x: str, col_y: str, dp: int = 6
) -> DataFrame:
    """Contingency panel for two categorical columns.

    Returns one row per cell of the FULL r x c grid — including
    unobserved combinations with n_xy = 0: chi-square charges every
    zero cell its full expected count ((0-exp)^2/exp = exp), so
    iterating observed cells only silently understates dependence
    (a fully deterministic 2x2 would score V ≈ 0.71 instead of 1).
    Columns: (x, y, n_xy, exp_n, chi2_term, mi_term) plus the
    table-level chi2, cramers_v and mutual_info repeated on every row
    (windows over the cell frame). NULL categories are excluded on
    both sides.

    chi2 = sum (n_xy - exp)^2 / exp with exp = row_tot * col_tot / n;
    Cramér's V = sqrt(chi2 / (n * (min(r, c) - 1))); MI (nats) =
    sum p_xy * ln(n * n_xy / (row_tot * col_tot)) with the usual
    0*ln(0) = 0 convention on zero cells. The grid is the cross join
    of the two DISTINCT category frames — category-cardinality-sized,
    broadcast — never a data-sized cross join.
    """
    observed = (
        df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .groupBy(F.col(col_x).alias("x"), F.col(col_y).alias("y"))
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    cells = (
        observed.select("x")
        .distinct()
        .crossJoin(F.broadcast(observed.select("y").distinct()))
        .join(observed, ["x", "y"], "left")
        .select(
            "x", "y", F.coalesce("n_xy", F.lit(0).cast("long")).alias("n_xy")
        )
    )
    wall = Window.partitionBy()
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    n = F.sum("n_xy").over(wall).cast("double")
    row_tot = F.sum("n_xy").over(wx).cast("double")
    col_tot = F.sum("n_xy").over(wy).cast("double")
    exp_n = row_tot * col_tot / n
    chi2_term = F.pow(F.col("n_xy") - exp_n, F.lit(2.0)) / exp_n
    mi_term = F.when(F.col("n_xy") == 0, F.lit(0.0)).otherwise(
        (F.col("n_xy") / n) * F.log(n * F.col("n_xy") / (row_tot * col_tot))
    )
    r_card = F.size(F.collect_set("x").over(wall))
    c_card = F.size(F.collect_set("y").over(wall))
    chi2 = F.sum(chi2_term).over(wall)
    return (
        cells.withColumn("exp_n", F.round(exp_n, dp))
        .withColumn("chi2_term", F.round(chi2_term, dp))
        .withColumn("mi_term", F.round(mi_term, dp))
        .withColumn("chi2", F.round(chi2, dp))
        .withColumn(
            "cramers_v",
            F.round(
                F.sqrt(
                    chi2
                    / (n * (F.least(r_card, c_card) - F.lit(1)).cast("double"))
                ),
                dp,
            ),
        )
        .withColumn("mutual_info", F.round(F.sum(mi_term).over(wall), dp))
        .select(
            "x", "y", "n_xy", "exp_n", "chi2_term", "mi_term",
            "chi2", "cramers_v", "mutual_info",
        )
    )
