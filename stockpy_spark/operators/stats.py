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

from stockpy_spark.operators.bucketing import freq_edges, with_freq_bucket
from stockpy_spark.operators.pinning import pin


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
                # try_divide: a CONSTANT column has zero variance and
                # an undefined correlation — NULL, not the ANSI
                # DIVIDE_BY_ZERO a plain / raises (r11 degenerate sweep)
                F.try_divide(
                    n * F.col(f"sp_{cx}_{cy}") - F.col(f"s_{cx}") * F.col(f"s_{cy}"),
                    F.sqrt(
                        (n * F.col(f"ss_{cx}") - F.col(f"s_{cx}") * F.col(f"s_{cx}"))
                        * (n * F.col(f"ss_{cy}") - F.col(f"s_{cy}") * F.col(f"s_{cy}"))
                    ),
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
            # try_divide: a 1x1 contingency table has min(r,c)-1 = 0
            # and an undefined V — NULL (r11 degenerate sweep)
            F.round(
                F.sqrt(
                    F.try_divide(
                        chi2,
                        n * (F.least(r_card, c_card) - F.lit(1)).cast("double"),
                    )
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


def welch_ttest(
    ref: DataFrame, cur: DataFrame, value_col: str, dp: int = 6
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test — the experiment /
    cohort-comparison companion of the drift screens (operators/
    drift.py): PSI/KS ask "did the distribution move", the t-test asks
    "did the MEAN move, and is it noise" without assuming equal
    variances (the assumption plain Student's t gets wrong on real
    metrics).

    Returns ONE row: (n_ref, n_cur, mean_ref, mean_cur, t_stat, df)
    with the Welch-Satterthwaite degrees of freedom; everything rounded
    to ``dp``. One aggregate per side (count/sum/sum-of-squares,
    map-side combined) joined by a 1-row cross — no data-sized shuffle
    at all. Sample variance via (ss - s^2/n) / (n - 1), the same
    expression shape the SQL oracle runs. NULLs excluded.
    """

    def moments(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        return df.filter(v.isNotNull()).agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum(v).alias(f"s_{tag}"),
            F.sum(v * v).alias(f"ss_{tag}"),
        )

    both = moments(ref, "ref").crossJoin(F.broadcast(moments(cur, "cur")))
    n1, n2 = F.col("n_ref").cast("double"), F.col("n_cur").cast("double")
    m1, m2 = F.col("s_ref") / n1, F.col("s_cur") / n2
    # try_divide throughout the degenerate edge (r11 sweep): a 1-row
    # side has no sample variance (n-1 = 0) and two CONSTANT sides
    # have zero standard error — both make t undefined; NULL t/df,
    # never an ANSI DIVIDE_BY_ZERO. Means stay defined either way.
    v1 = F.try_divide(
        F.col("ss_ref") - F.col("s_ref") * F.col("s_ref") / n1, n1 - 1
    )
    v2 = F.try_divide(
        F.col("ss_cur") - F.col("s_cur") * F.col("s_cur") / n2, n2 - 1
    )
    se1, se2 = v1 / n1, v2 / n2
    t = F.try_divide(m1 - m2, F.sqrt(se1 + se2))
    df_ws = F.try_divide(
        F.pow(se1 + se2, F.lit(2.0)),
        F.pow(se1, F.lit(2.0)) / (n1 - 1) + F.pow(se2, F.lit(2.0)) / (n2 - 1),
    )
    return both.select(
        "n_ref",
        "n_cur",
        F.round(m1, dp).alias("mean_ref"),
        F.round(m2, dp).alias("mean_cur"),
        F.round(t, dp).alias("t_stat"),
        F.round(df_ws, dp).alias("df"),
    )


def mahalanobis_outliers_2d(
    df: DataFrame,
    keys: list[str],
    col_x: str,
    col_y: str,
    threshold: float,
    dp: int = 6,
) -> DataFrame:
    """Bivariate Mahalanobis outlier screen: rows whose squared
    Mahalanobis distance from the (col_x, col_y) centroid exceeds
    ``threshold`` — the correlation-aware generalization of the
    per-column z-score clip (quality_robust_clip): a point can be
    unremarkable on each axis yet far off the correlation ridge, and
    md2 is what catches it (under bivariate normality md2 ~ chi^2 with
    2 df, so 13.8 ≈ the 0.1% tail).

    The 2-D case needs no matrix inverse — the closed form
        md2 = (zx^2 - 2 r zx zy + zy^2) / (1 - r^2)
    uses only the five moments of ONE aggregate scan (broadcast back as
    a 1-row census), keeping everything a narrow per-row expression the
    SQL oracle replays. Rows with a NULL in either column are excluded
    both from the moments and the output; the filter compares the
    ROUNDED md2 so the cut replays exactly cross-engine. Degenerate
    inputs (zero variance or |r| = 1) yield NULL md2 and no rows.

    Returns (keys..., x, y, md2) sorted by nothing — callers rank.
    """
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())
    cen = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    mx, my = F.col("sx") / n, F.col("sy") / n
    # try_divide through the degenerate covariance edge (r11 sweep):
    # one row (n-1 = 0), a constant axis (v = 0), or perfect
    # correlation (1 - r^2 = 0, the ellipse collapses to a line) all
    # make md2 undefined — those rows surface NULL md2 and are never
    # flagged, instead of the ANSI DIVIDE_BY_ZERO a plain / raises.
    vx = F.try_divide(F.col("sxx") - F.col("sx") * F.col("sx") / n, n - 1)
    vy = F.try_divide(F.col("syy") - F.col("sy") * F.col("sy") / n, n - 1)
    cxy = F.try_divide(F.col("sxy") - F.col("sx") * F.col("sy") / n, n - 1)
    r = F.try_divide(cxy, F.sqrt(vx * vy))
    zx = F.try_divide(x - mx, F.sqrt(vx))
    zy = F.try_divide(y - my, F.sqrt(vy))
    md2 = F.try_divide(zx * zx - 2 * r * zx * zy + zy * zy, 1 - r * r)
    return (
        base.crossJoin(F.broadcast(cen))
        .select(
            *keys,
            x.alias("x"),
            y.alias("y"),
            F.round(md2, dp).alias("md2"),
        )
        .filter(F.col("md2") >= F.lit(float(threshold)))
    )


def categorical_entropy(
    df: DataFrame, cols: list[str], dp: int = 6
) -> DataFrame:
    """Shannon entropy profile of categorical columns — the one-number
    screen for dead columns (entropy ~ 0: constant), exploded keys
    (entropy ~ ln n: near-unique), and drifted encodings.

    Returns one row per column: (col_name, n_values, n_distinct,
    entropy, norm_entropy) with entropy in nats and norm_entropy =
    entropy / ln(n_distinct) in [0, 1] (NULL when n_distinct = 1).
    NULL category values are excluded (their share is the DQ suite's
    null_fraction check, a different question).

    One pass: every row explodes into (col_name, value) pairs — a
    len(cols)-way narrow fan-out, the unpivot idiom — then a single
    (col_name, value) groupBy and a per-column aggregate. Scanning
    once regardless of column count is the point; len(cols) jobs of
    ``groupBy(col).count()`` would rescan the table per column.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.val")
    counts = (
        pairs.filter(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql.window import Window

    wcol = Window.partitionBy("col_name")
    p = F.col("c") / F.sum("c").over(wcol)
    ent = counts.withColumn("term", -p * F.log(p)).groupBy("col_name").agg(
        F.sum("c").alias("n_values"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("term").alias("h"),
    )
    return ent.select(
        "col_name",
        "n_values",
        "n_distinct",
        F.round("h", dp).alias("entropy"),
        F.round(
            F.when(
                F.col("n_distinct") > 1,
                F.col("h") / F.log(F.col("n_distinct").cast("double")),
            ),
            dp,
        ).alias("norm_entropy"),
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str | None = None,
    dp: int = 6,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group Gini coefficient of ``value_col`` — the concentration
    screen a corpus curator runs on documents-per-source or
    tokens-per-domain (a 0.9 Gini corpus is one crawler's output
    wearing a diversity costume) and a revenue analyst runs on
    customer concentration.

    Exact rank formulation over the group-sorted values
        G = 2 * sum(i * x_(i)) / (n * sum(x)) - (n + 1) / n.
    The rank-weighted sum over any run of EQUAL values is invariant to
    how ties are ordered (consecutive ranks times the same x), so no
    tiebreak column is needed — ``id_col`` is accepted and ignored for
    backward compatibility. Values must be non-negative; NULLs
    excluded. Returns (group, n, total, gini), gini rounded to ``dp``,
    total to cents (2 dp — see the in-code precision note).

    Scale shape: a plain per-group rank window funnels each group
    through ONE task — with few groups (the common case: priority
    classes, sources, domains) that is a single-task sort of the whole
    table, measured 14.2x at 100x data. Instead the table first
    collapses to its distinct (group, value) RUNS (rank-weighted sums
    over a run of c equal values x starting after o prior rows close
    in closed form: x * (c*o + c*(c+1)/2) — the tie-invariance noted
    above, used constructively), then the value axis is range-bucketed
    on EQUAL-FREQUENCY quantile edges from a per-group
    ``percentile_approx`` census (operators/bucketing.py; the r11
    verdict: (min, max) equal-width edges collapse under one outlier
    value — and gini's home turf, revenue/token concentration, is
    heavy-tailed by definition). Each (group, bucket) ranks LOCALLY in
    parallel, per-bucket run counts close into global rank offsets
    through a groups-x-buckets-sized window (KBs), and
        sum(i * x) = sum_buckets( sum(run closed form) + offset * sum(x) )
    by rank additivity. The run collapse also caps the window frame:
    a 50%-zeros revenue column is ONE run, not half the corpus in one
    bucket. One map-side-combinable shuffle into (group, value) runs,
    one into (group, bucket) sorts, everything after is censusy.
    Census and edges joins carry no broadcast hint (per-group frames
    are key-cardinality-sized — AQE broadcasts while they fit).
    """
    from pyspark.sql.window import Window

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("x"),
    )
    # eager checkpoint (r12, the ks_2samp precedent in drift.py): the
    # distinct-run aggregate collapses the fact and feeds three
    # branches (edges census, local rank, per-bucket totals)
    runs = base.groupBy("grp", "x").agg(
        F.count(F.lit(1)).alias("c")
    ).transform(pin)
    # eager checkpoint (group-cardinality rows): the bucketing.py
    # determinism rule — percentile_approx varies per materialization
    # and this census feeds both the local-rank and offset branches
    census = runs.groupBy("grp").agg(
        freq_edges("x", n_buckets).alias("__edges")
    ).transform(pin)
    bucketed = with_freq_bucket(
        runs.join(census, "grp"),
        F.col("x"),
        F.col("__edges"),
        n_buckets,
        "bkt",
    ).select("grp", "x", "c", "bkt")
    # pin the data-sized local-rank sort to (grp, bkt) tasks — a
    # grp-partitioned census-join output would satisfy the window's
    # clustering requirement on the grp subset and serialize each
    # group through one task (the interval_concurrency lesson); this
    # repartition replaces the ENSURE_REQUIREMENTS exchange the window
    # needs anyway.
    bucketed = bucketed.repartition("grp", "bkt")
    # exclusive prefix count of rows BEFORE each run within its bucket
    wloc = (
        Window.partitionBy("grp", "bkt")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "o_loc", F.coalesce(F.sum("c").over(wloc), F.lit(0))
    )
    per_bucket = local.groupBy("grp", "bkt").agg(
        F.sum("c").alias("c"),
        F.sum(F.col("c") * F.col("x")).alias("s_x"),
        F.sum(
            F.col("x")
            * (
                F.col("c") * F.col("o_loc")
                + F.col("c") * (F.col("c") + 1) / F.lit(2.0)
            )
        ).alias("s_ix"),
    )
    # exclusive running count over the G x B frame -> global rank offset
    woff = (
        Window.partitionBy("grp")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    closed = per_bucket.withColumn(
        "off", F.sum("c").over(woff) - F.col("c")
    )
    n = F.sum("c").cast("double")
    six = F.sum(F.col("s_ix") + F.col("off") * F.col("s_x"))
    return closed.groupBy("grp").agg(
        F.sum("c").alias("n"),
        # money-magnitude sums round to cents: at ~1e9 a 6-dp round
        # sits below double precision and cross-engine summation order
        # would flip the last digit
        F.round(F.sum("s_x"), 2).alias("total"),
        F.round(
            # try_divide: an all-zero group has no mass to
            # concentrate — gini undefined, NULL (r11 degenerate sweep)
            2.0 * F.try_divide(six, n * F.sum("s_x")) - (n + 1.0) / n,
            dp,
        ).alias("gini"),
    )


def ols2_by_group(
    df: DataFrame,
    group_col: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
    dp: int = 6,
) -> DataFrame:
    """Per-group TWO-feature OLS ``y = b0 + b1*x1 + b2*x2`` solved in
    closed form from one decomposable aggregation pass — the step past
    the SQL-standard single-regressor ``regr_slope`` family (ts_trend):
    the 3x3 normal equations need only the nine moment sums
    (n, Sx1, Sx2, Sy, Sx1x1, Sx2x2, Sx1x2, Sx1y, Sx2y), all
    map-side-combinable, and Cramer's rule turns them into
    coefficients with no iteration and no driver linear algebra —
    at 100 TB this is ONE narrow shuffle of nine partials per group
    (the same moment-partials idea as the PCA GEMM, closed over 3
    features instead of eigensolved over 64).

    Cross-engine exactness contract (what lets the full result sit
    under a value-hash oracle instead of a tolerance gate):
    ``x1_col``/``x2_col`` must be INTEGER-typed and ``y_col``
    DECIMAL-typed (pre-round upstream) — every moment sum is then
    exact (integer / decimal arithmetic, order-independent), both
    engines derive coefficients from bit-identical sums, and only the
    final doubles are rounded to ``dp``. Raises on non-conforming
    types rather than silently accumulating order-dependent doubles.
    Groups with a singular system (collinear or constant features)
    emit NULL coefficients (det rounds to 0 at ``dp``).

    Returns (group, n, b0, b1, b2).
    """
    from pyspark.sql import types as T

    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in (x1_col, x2_col):
        if not isinstance(df.schema[c].dataType, int_types):
            raise ValueError(
                f"ols2_by_group: {c} must be integer-typed for exact "
                f"moments, got {df.schema[c].dataType.simpleString()}"
            )
    if not isinstance(df.schema[y_col].dataType, T.DecimalType):
        raise ValueError(
            f"ols2_by_group: {y_col} must be DECIMAL-typed (pre-rounded) "
            f"for exact moments, got {df.schema[y_col].dataType.simpleString()}"
        )
    g = F.col(group_col).alias("grp")
    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    m = df.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx11"),
        F.sum(x2 * x2).alias("sx22"),
        F.sum(x1 * x2).alias("sx12"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
    )
    # Cramer over the (symmetric) normal matrix, in doubles built from
    # the exact sums
    n = F.col("n").cast("double")
    a = [
        [n, F.col("sx1").cast("double"), F.col("sx2").cast("double")],
        [
            F.col("sx1").cast("double"),
            F.col("sx11").cast("double"),
            F.col("sx12").cast("double"),
        ],
        [
            F.col("sx2").cast("double"),
            F.col("sx12").cast("double"),
            F.col("sx22").cast("double"),
        ],
    ]
    b = [
        F.col("sy").cast("double"),
        F.col("sx1y").cast("double"),
        F.col("sx2y").cast("double"),
    ]

    def det3(m3):
        return (
            m3[0][0] * (m3[1][1] * m3[2][2] - m3[1][2] * m3[2][1])
            - m3[0][1] * (m3[1][0] * m3[2][2] - m3[1][2] * m3[2][0])
            + m3[0][2] * (m3[1][0] * m3[2][1] - m3[1][1] * m3[2][0])
        )

    def replace_col(m3, j):
        return [
            [b[i] if k == j else m3[i][k] for k in range(3)]
            for i in range(3)
        ]

    det = det3(a)
    singular = F.round(det, dp) == 0
    coef = [
        F.when(singular, F.lit(None)).otherwise(
            F.round(det3(replace_col(a, j)) / det, dp)
        )
        for j in range(3)
    ]
    return m.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        coef[0].alias("b0"),
        coef[1].alias("b1"),
        coef[2].alias("b2"),
    )


def cuped_adjusted_metrics(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    dp: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — the experimentation
    workhorse): each user's experiment-period metric Y is adjusted by
    their pre-period covariate X, ``Y_adj = Y - theta * (X - mean(X))``
    with ``theta = cov(X, Y) / var(X)``, which provably minimizes
    variance among linear adjustments and leaves the mean unbiased.
    Pre/post split at the integer epoch midpoint of the observed range
    (exact integer arithmetic, deterministic).

    Oracle contract: theta and mean(X) are corpus moments — sums of
    doubles whose accumulation order differs across engines — so BOTH
    are rounded to ``dp`` BEFORE the per-user adjustment; downstream
    values are then pure per-user arithmetic on identically-rounded
    constants. Scale shape: one user-keyed conditional aggregate
    (map-side combined), one 1-row moment census broadcast back, one
    narrow adjust — the fact table shuffles once."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(F.col(user_col).alias("u"), sec.alias("es"),
             F.col(value_col).alias("v"))
    rng = base.agg(
        F.min("es").alias("lo"), F.max("es").alias("hi")
    )
    # integer midpoint: deterministic, no float
    mid = F.floor((F.col("lo") + F.col("hi")) / 2).cast("long")
    per_user = (
        base.crossJoin(F.broadcast(rng.select(mid.alias("mid"))))
        .groupBy("u")
        .agg(
            F.sum(F.when(F.col("es") <= F.col("mid"), F.col("v")).otherwise(0.0)).alias("x"),
            F.sum(F.when(F.col("es") > F.col("mid"), F.col("v")).otherwise(0.0)).alias("y"),
        )
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        F.round(F.col("sx") / F.col("n"), dp).alias("xbar"),
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
            dp,
        ).alias("theta"),
    )
    return (
        per_user.crossJoin(F.broadcast(mom))
        .select(
            F.col("u").alias(user_col),
            F.round("x", dp).alias("pre_value"),
            F.round("y", dp).alias("post_value"),
            "theta",
            F.round(
                F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar")),
                dp,
            ).alias("post_adjusted"),
        )
    )


def kde_grid(
    df: DataFrame,
    value_col: str,
    n_grid: int = 32,
    bandwidth: float = 5.0,
    dp: int = 6,
) -> DataFrame:
    """Gaussian kernel density estimate on a fixed grid — the smoothed
    distribution profile a histogram's bin edges distort (drift
    dashboards and anomaly baselines want the smooth curve):
    ``f(g) = (1 / (n h sqrt(2 pi))) * sum_i exp(-((g - x_i) / h)^2 / 2)``
    evaluated at ``n_grid`` points spanning [floor(min), ceil(max)]
    (integer bounds, so the grid is exactly reproducible).

    Plan: one 1-row bounds census (broadcast), then ONE corpus pass
    computing all grid points as conditional sums inside a single
    aggregate — no explode, no per-grid-point scan; at 100 TB this is
    a map-side-combined aggregate whose state is n_grid doubles.
    Returns (grid_idx, grid_value, density)."""
    import math

    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("__x")
    )
    bounds = base.agg(
        F.floor(F.min("__x")).cast("double").alias("__lo"),
        F.ceil(F.max("__x")).cast("double").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    withb = base.crossJoin(F.broadcast(bounds))

    def grid_point(j: int):
        return F.col("__lo") + (F.col("__hi") - F.col("__lo")) * F.lit(
            float(j)
        ) / F.lit(float(n_grid - 1))

    sums = withb.agg(
        F.first("__lo").alias("__lo"),
        F.first("__hi").alias("__hi"),
        F.first("__n").alias("__n"),
        *[
            F.sum(
                F.exp(
                    -((grid_point(j) - F.col("__x")) / F.lit(bandwidth)) ** 2
                    / F.lit(2.0)
                )
            ).alias(f"__s{j}")
            for j in range(n_grid)
        ],
    )
    norm = 1.0 / (bandwidth * math.sqrt(2.0 * math.pi))
    rows = sums.select(
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.round(
                            F.col("__lo")
                            + (F.col("__hi") - F.col("__lo"))
                            * F.lit(float(j))
                            / F.lit(float(n_grid - 1)),
                            dp,
                        ).alias("grid_value"),
                        F.round(
                            F.lit(norm) * F.col(f"__s{j}") / F.col("__n"), dp
                        ).alias("density"),
                    )
                    for j in range(n_grid)
                ]
            )
        ).alias("grid_idx", "__gd")
    )
    return rows.select(
        F.col("grid_idx").cast("int").alias("grid_idx"),
        F.col("__gd.grid_value").alias("grid_value"),
        F.col("__gd.density").alias("density"),
    )


#: Rank-table rows below which the per-column rank join broadcasts
#: instead of re-shuffling the combo census (guide §3.1). 1M
#: (value, rank) double pairs ≈ 16 MB framed — the same executor
#: budget FRONTIER_BROADCAST_MAX (operators/graph.py) reasons from.
#: The cardinality is read from the census job, so the decision is
#: data-driven, not a local-mode constant: a genuinely continuous
#: column exceeds it at any real scale and keeps the sort-merge join.
RANK_BROADCAST_MAX = 1_000_000

#: Rank tables at or below this many distinct values embed as plan
#: literals (see the r17 block in spearman_corr_pairs) — KB-scale in
#: the task binary (10k rows x 16 B = 160 KB). Between this and
#: RANK_BROADCAST_MAX the table still broadcasts; above, it sort-
#: merges. All three tiers are decided from the census's measured
#: cardinality, not a local-mode constant.
RANK_LITERAL_MAX = 10_000


def spearman_corr_pairs(
    df: DataFrame, cols: list[str], dp: int = 6, n_buckets: int = 256
) -> DataFrame:
    """Exact Spearman rank correlation for every column pair — the
    monotonic-dependence screen Pearson (stats_corr_matrix) misses on
    nonlinear-but-ordered relationships, with textbook average ranks
    for ties. Rank derivation is RELATIONAL, not a global row window,
    and the fact table is touched EXACTLY ONCE: a single map-side-
    combined joint census ``groupBy(*cols).count()`` collapses the
    corpus to its distinct value COMBINATIONS, and every downstream
    step — per-column counts, ranks, weighted rank moments — is
    combo-scale. (The r10 formulation joined each column's rank
    table back onto the fact: three fact-scale shuffle joins,
    measured 32 s at the 60M-row decade vs ~10 s for this plan; the
    join-back was pointless because the moment sums only need
    combination WEIGHTS, not rows.) Per column,
    ``avg_rank(v) = (#rows < v) + (#rows = v + 1) / 2`` with
    #rows-below from a BUCKETED prefix-sum over the sorted
    distinct-value table — the drift.py ECDF pattern, NOT a
    partition-less WindowExec: a continuous column has distinct-count
    ~ row-count, so a global ``Window.orderBy`` would drag the corpus
    through one sorter task (the skyline/KS/Gini disease). Instead a
    1-row equal-frequency quantile census range-buckets the distinct
    values (bucketing.py — (min, max) width was outlier-fragile; the
    census costs O(n_buckets) percentile queries, measured 0.35 s at
    B=256 vs 1.45 s at B=1024 on a 580k-distinct frame, so the
    default stays 256 — raise it when distinct-per-task at your
    cluster's core count says so, the outputs are invariant), each
    bucket cumsums locally (corpus/n_buckets rows per task), and a
    KB-sized exclusive bucket-offset frame broadcast-joins back.
    Cardinality contract: cost = one fact scan + one combo-sized
    shuffle; when every row is a distinct combination (k genuinely
    continuous columns) the census degrades to the unavoidable
    rank-pairing shuffle — exactly the regime where exact Spearman
    stops being the right tool. Ranks are exact halves, so the
    weighted moment sums differ from a row-order sum only in float
    accumulation order, absorbed by the dp rounding the cross-engine
    contract already requires."""
    from pyspark.sql import Window

    base = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    ).where(
        None
        if not cols
        else __import__("functools").reduce(
            lambda a, b: a & b, [F.col(c).isNotNull() for c in cols]
        )
    )
    # the census materializes ONCE (combo-scale state, the kcenter/
    # graph localCheckpoint class): every rank branch re-reads it
    # instead of re-scanning and re-aggregating the fact — deriving
    # branches lazily replicated the fact subplan per branch (one
    # probe read 26 embedded scans; ReuseExchange did not collapse
    # them), and deriving them from the progressively-joined frame is
    # worse still (exponential nesting, 638 exchanges)
    combo = (
        base.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__w"))
        .transform(pin)
    )
    # equal-FREQUENCY edges over the distinct values (each distinct
    # value weight 1 — the window rows ARE distinct values): the r11
    # verdict's outlier finding — one sentinel value collapses a
    # (min, max) width so every distinct value floors into bucket 0
    # and the local cumsum degenerates to the single-task sort this
    # bucketing exists to kill. Bucket id = branchless log2(B) binary
    # search (operators/bucketing.py), not an O(B) per-row scan.
    #
    # r16 (guide §1.2 then §3.1): until r16 each column ran its OWN
    # eager census pin — k sequential blocking jobs at plan-build
    # time, each a percentile aggregate whose 1-row result then rode a
    # crossJoin broadcast. All k censuses now compute in ONE job (the
    # tagged union of the per-column count frames aggregates per tag)
    # and the k-row result is COLLECTED: the edges embed as array
    # literals (a k x (B-1)-double census is a codebook-class driver
    # transfer, and a single materialization read once is strictly
    # more deterministic than percentile re-execution), and the
    # per-column distinct counts ride along for free — they drive the
    # rank-table broadcast decision below.
    tagged = None
    for c in cols:
        t = (
            combo.groupBy(F.col(c).alias("__v"))
            .agg(F.sum("__w").alias("__c"))
            .select(F.lit(c).alias("__col"), "__v", "__c")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    census_rows = (
        []
        if tagged is None
        else tagged.groupBy("__col")
        .agg(
            freq_edges("__v", n_buckets).alias("__edges"),
            F.count(F.lit(1)).alias("__nd"),
        )
        .collect()
    )
    censuses = {r["__col"]: (r["__edges"], r["__nd"]) for r in census_rows}

    # r17 (guide §1.2 + pinning.pin_literal): a rank table is
    # distinct-value-sized, and the census already told us each
    # column's cardinality — for a LOW-cardinality column (lineitem's
    # quantity: 50, discount: 11; the decision is data-driven, the
    # same at any SF) the whole avg-rank derivation is exact integer
    # arithmetic plus a final +(c+1)/2.0, so ONE batched collect of
    # the small columns' count tables replaces, per column, the
    # count exchange + bucketed window + offset window + broadcast
    # build with a plan-literal LocalRelation join. The Python ranks
    # are bit-identical by construction: cum-below is an exact int
    # (< 2^53), (c+1)/2.0 is an exact half, and the closing
    # double-add matches the JVM's left-associated (off + lt) + half.
    # Columns with NaN values or a failed literal path fall back to
    # the bucketed derivation unchanged.
    lit_rank_tables: dict = {}
    small = [
        c for c in cols
        if 0 < censuses.get(c, (None, 0))[1] <= RANK_LITERAL_MAX
    ]
    if small:
        try:
            t2 = None
            for c in small:
                t = (
                    combo.groupBy(F.col(c).alias("__v"))
                    .agg(F.sum("__w").alias("__c"))
                    .select(F.lit(c).alias("__col"), "__v", "__c")
                )
                t2 = t if t2 is None else t2.unionByName(t)
            cpdf = t2.toPandas()
            import pandas as pd

            from pyspark.sql.types import (
                DoubleType,
                StructField,
                StructType,
            )

            for c in small:
                sub = cpdf[cpdf["__col"] == c]
                vals = [float(v) for v in sub["__v"]]
                cnts = [int(x) for x in sub["__c"]]
                if any(v != v for v in vals):  # NaN: Spark-path only
                    continue
                order = sorted(range(len(vals)), key=lambda i: vals[i])
                below = 0
                vcol, rcol = [], []
                for i in order:
                    vcol.append(vals[i])
                    rcol.append(float(below) + (cnts[i] + 1) / 2.0)
                    below += cnts[i]
                lit_df = df.sparkSession.createDataFrame(
                    pd.DataFrame({c: vcol, f"__r_{c}": rcol}),
                    schema=StructType(
                        [
                            StructField(c, DoubleType()),
                            StructField(f"__r_{c}", DoubleType()),
                        ]
                    ),
                )
                if "LocalRelation" in (
                    lit_df._jdf.queryExecution().optimizedPlan().toString()
                ):
                    lit_rank_tables[c] = lit_df
        except Exception:
            lit_rank_tables = {}

    ranked = combo
    for c in cols:
        if c in lit_rank_tables:
            ranked = ranked.join(F.broadcast(lit_rank_tables[c]), c)
            continue
        counts = combo.groupBy(F.col(c).alias("__v")).agg(
            F.sum("__w").alias("__c")
        )
        edges, n_distinct = censuses.get(c, (None, 0))
        edges_lit = (
            F.array(*[F.lit(float(e)) for e in edges])
            if edges
            else F.array().cast("array<double>")
        )
        bucketed = with_freq_bucket(
            counts,
            F.col("__v"),
            edges_lit,
            n_buckets,
            "__bkt",
        ).select("__v", "__c", "__bkt")
        # exclusive cumsum WITHIN each bucket (task size = distinct/n_buckets)
        wloc = Window.partitionBy("__bkt").orderBy("__v").rowsBetween(
            Window.unboundedPreceding, -1
        )
        local = bucketed.withColumn(
            "__lt_loc", F.coalesce(F.sum("__c").over(wloc), F.lit(0))
        )
        # n_buckets-row totals -> exclusive bucket offsets (tiny task)
        woff = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = (
            bucketed.groupBy("__bkt")
            .agg(F.sum("__c").alias("__bt"))
            .select(
                "__bkt",
                F.coalesce(F.sum("__bt").over(woff), F.lit(0)).alias("__off"),
            )
        )
        cum = local.join(F.broadcast(offsets), "__bkt").select(
            F.col("__v").alias(c),
            (
                F.col("__off")
                + F.col("__lt_loc")
                + (F.col("__c") + 1) / F.lit(2.0)
            ).alias(f"__r_{c}"),
        )
        # r16 (guide §3.1): these k joins each re-shuffled the FULL
        # combo frame by a different key — for lineitem's
        # (quantity, price, discount) that was 3 combo-scale sort-merge
        # shuffles, ~37 MB of the corpus's ledger, when two of the
        # three rank tables are 50 and 11 rows. A rank table is
        # distinct-value-sized and its cardinality is ALREADY KNOWN
        # from the census job, so broadcast it when it fits (the size
        # estimate Spark lacks here: `cum` hangs below windows and a
        # join, so the planner sees "unknown, assume big"). The big-
        # distinct column (price at corpus scale) stays a sort-merge
        # join — the one combo shuffle that is fundamentally required.
        ranked = ranked.join(
            F.broadcast(cum) if n_distinct <= RANK_BROADCAST_MAX else cum,
            c,
        )
    w = F.col("__w").cast("double")
    mom_exprs = [F.sum("__w").cast("double").alias("__n")]
    for c in cols:
        mom_exprs.append(F.sum(w * F.col(f"__r_{c}")).alias(f"__s_{c}"))
        mom_exprs.append(
            F.sum(w * F.col(f"__r_{c}") * F.col(f"__r_{c}")).alias(
                f"__ss_{c}"
            )
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            mom_exprs.append(
                F.sum(w * F.col(f"__r_{a}") * F.col(f"__r_{b}")).alias(
                    f"__sxy_{a}_{b}"
                )
            )
    mom = ranked.agg(*mom_exprs)
    out_rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            num = F.col(f"__sxy_{a}_{b}") - F.col(f"__s_{a}") * F.col(
                f"__s_{b}"
            ) / F.col("__n")
            var_a = F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(
                f"__s_{a}"
            ) / F.col("__n")
            var_b = F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(
                f"__s_{b}"
            ) / F.col("__n")
            out_rows.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    # try_divide: a CONSTANT column has zero rank
                    # variance and an undefined correlation — surface
                    # NULL instead of the ANSI DIVIDE_BY_ZERO error a
                    # plain / raises (latent since r10, found by the
                    # r11 brute-force property test)
                    F.round(
                        F.try_divide(num, F.sqrt(var_a * var_b)), dp
                    ).alias("spearman"),
                )
            )
    return mom.select(F.explode(F.array(*out_rows)).alias("__p")).select(
        "__p.col_x", "__p.col_y", "__p.spearman"
    )
