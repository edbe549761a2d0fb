"""Declarative data-quality constraint checking (deequ-style, minimal).

A 100 TB ingest needs its gate checks computed in ONE pass per table,
not one scan per assertion: every metric here is an aggregate
expression, so a suite of N constraints over a table compiles to a
single ``agg(...)`` — one scan, one reduce, N columns — then unpivots
to the long (constraint, metric, passed) form a quality dashboard or a
pipeline guard consumes. Cross-table checks (referential integrity)
are the exception: each one is an anti-join, aggregated to a count.

Reference parity: the reference's pipelines guard with row-count and
schema probes (scripts/transform_stocks_job.py:63-71 empty-frame
bailout); this generalizes that into a constraint vocabulary. The
metric is always a DOUBLE (counts cast) so the long form is uniform.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: a name, an aggregate metric expression, and a
    predicate over the metric value deciding pass/fail."""

    name: str
    metric: Column
    passes: Callable[[Column], Column]


def null_fraction(col: str, at_most: float) -> Check:
    return Check(
        f"null_fraction({col})<={at_most}",
        F.avg(F.col(col).isNull().cast("double")),
        lambda m: m <= at_most,
    )


def unique_key(col: str) -> Check:
    """Duplicate count of a supposed primary key (0 = unique)."""
    return Check(
        f"unique({col})",
        (F.count(col) - F.count_distinct(F.col(col))).cast("double"),
        lambda m: m == 0,
    )


def value_range(col: str, lo: float, hi: float) -> Check:
    """Count of non-null values outside [lo, hi] (0 = all in range)."""
    return Check(
        f"range({col})in[{lo},{hi}]",
        F.sum(
            (~F.col(col).between(lo, hi)).cast("double")
        ),
        lambda m: m == 0,
    )


def min_rows(at_least: int) -> Check:
    return Check(
        f"rows>={at_least}",
        F.count(F.lit(1)).cast("double"),
        lambda m: m >= at_least,
    )


def accepted_values(col: str, allowed: list[str]) -> Check:
    """Count of non-null values outside the allowed set."""
    return Check(
        f"accepted({col})",
        F.sum((~F.col(col).isin(allowed)).cast("double")),
        lambda m: m == 0,
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate a suite in ONE aggregate pass; returns the long frame
    (constraint STRING, metric DOUBLE, passed BOOLEAN), one row per
    check, ordered as given (a stable output for diffing run-to-run).

    The single ``agg`` is the point: Catalyst fuses all N metrics into
    one partial-aggregate scan, so adding a constraint costs a column,
    not a pass over 100 TB.

    NULL-aggregate guard: on empty input (or an all-NULL column) avg/
    sum aggregates return NULL, which would make ``passed`` NULL —
    neither true nor false, silently invisible to a ``passed = false``
    pipeline gate. Metrics coalesce to 0.0 BEFORE the verdict, so the
    long frame never carries NULL verdicts (vacuous suites pass
    explicitly; min_rows still fails on empty input because count is
    0, not NULL).
    """
    wide = df.agg(
        *[c.metric.alias(f"__m{i}") for i, c in enumerate(checks)]
    )
    metric = lambda i: F.coalesce(  # noqa: E731
        F.col(f"__m{i}").cast("double"), F.lit(0.0)
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint"),
                metric(i).alias("metric"),
                c.passes(metric(i)).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def orphan_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, name: str
) -> DataFrame:
    """Referential-integrity check as the same long frame: rows of
    ``child`` whose key has no match in ``parent`` (left-anti join,
    counted). Anti-join on the key is the scalable shape — a broadcast
    when the parent is a dimension, shuffle-hash when fact-to-fact."""
    n = (
        child.join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("metric"))
    )
    return n.select(
        F.lit(name).alias("constraint"),
        "metric",
        (F.col("metric") == 0).alias("passed"),
    )


def benford_first_digit(
    df: DataFrame, value_col: str, decimals: int = 6
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the
    forensic-DQ screen for fabricated or unit-mixed numeric columns.

    Returns one row per digit 1-9: observed count ``n``, expected count
    ``exp_n`` (total * log10(1 + 1/d)), and the column-level chi-square
    statistic repeated on every row (sum over digits of (n-exp)^2/exp;
    a 9-row unpartitioned window, not a second scan).

    The digit is extracted ARITHMETIC-FREE of float logs: value ->
    integer cents (round(value*100) as bigint) -> first character of
    its decimal string. log10-based extraction misclassifies exact
    powers of ten on engines whose libm differs in the last ulp; the
    integer-string route is bit-exact everywhere (values below 0.005
    round to 0 cents and are excluded, as are nulls and non-positives).
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    base = (
        df.filter(F.col(value_col) > 0)
        .select(cents.alias("__c"), digit.alias("digit"))
        .filter(F.col("__c") > 0)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    total = F.sum("n").over(w)
    exp_n = total * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chi2_term = F.pow(F.col("n") - exp_n, F.lit(2.0)) / exp_n
    return (
        base.withColumn("exp_n", F.round(exp_n, decimals))
        .withColumn("chi2", F.round(F.sum(chi2_term).over(w), decimals))
        .select("digit", "n", "exp_n", "chi2")
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 5, dp: int = 6
) -> DataFrame:
    """Join/groupBy-key skew report — the pre-flight check a 100 TB
    pipeline runs BEFORE shuffling on a key: at scale a single hot key
    is the difference between a 10-minute stage and a straggler that
    never finishes (this repo's own salted-join and AQE crossover
    numbers, BASELINE.md §4, all start from exactly this measurement).

    Returns the ``top_k`` hottest keys, one row each: (rank, key,
    n_rows, share, n_keys, mean_rows, skew_ratio) where share is the
    key's fraction of all rows and skew_ratio = max key count / mean
    key count (1.0 = perfectly uniform); the census triple is repeated
    on every row. NULL keys count as a key (NULL-heavy foreign keys
    are the most common hot key in the wild — hiding them would defeat
    the report).

    One groupBy (map-side combined), a 1-row census broadcast, and a
    top-k via per-partition heaps (TakeOrderedAndProject) — no global
    sort, driver state = top_k rows.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    census = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total"),
        F.max("n_rows").alias("max_rows"),
    )
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(census))
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    mean_rows = F.col("total") / F.col("n_keys")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("total"), dp).alias("share"),
        "n_keys",
        F.round(mean_rows, dp).alias("mean_rows"),
        F.round(F.col("max_rows") / mean_rows, dp).alias("skew_ratio"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Table-version diff — the regression check between two snapshots
    of the same keyed table (yesterday's build vs today's): one
    full-outer join on the key, then ONE aggregate classifying every
    key as added / removed / changed / unchanged, plus per-column
    change counts so "changed" is attributable without a second pass.

    NULL-safe value comparison (``eqNullSafe``): a column going NULL ->
    non-NULL (or back) counts as a change, never as "unchanged by
    three-valued logic" — the silent miss a plain ``=`` would make.
    Duplicate keys within a snapshot are a modeling error this check
    cannot absorb (the join would fan out); pre-dedup or fix upstream.

    Scale shape: one key shuffle (the join), one aggregate over the
    joined frame with every classification as a conditional sum —
    map-side combined, output is a single row regardless of input
    size. Returns (n_old, n_new, n_added, n_removed, n_changed,
    n_unchanged, changed_<col>...).
    """
    if not compare_cols:
        raise ValueError(
            "snapshot_diff requires at least one compare column; with "
            "none, changed/unchanged is undefined"
        )
    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, key_cols, "full")
    col_changed = [
        (
            F.col("__in_old").isNotNull()
            & F.col("__in_new").isNotNull()
            & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        ).cast("long").alias(f"__chg_{c}")
        for c in compare_cols
    ]
    j = j.select("__in_old", "__in_new", *col_changed)
    any_changed = sum(
        (F.col(f"__chg_{c}") for c in compare_cols[1:]),
        F.col(f"__chg_{compare_cols[0]}"),
    ) > 0
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()

    def cnt(expr, name):
        # ungrouped SUM over zero rows is NULL; two empty snapshots
        # must report 0 everywhere, not a row of NULL counts.
        return F.coalesce(F.sum(expr).cast("long"), F.lit(0).cast("long")).alias(name)

    return j.agg(
        cnt(F.coalesce("__in_old", F.lit(0)), "n_old"),
        cnt(F.coalesce("__in_new", F.lit(0)), "n_new"),
        cnt((F.col("__in_old").isNull()).cast("long"), "n_added"),
        cnt((F.col("__in_new").isNull()).cast("long"), "n_removed"),
        cnt((both & any_changed).cast("long"), "n_changed"),
        cnt((both & ~any_changed).cast("long"), "n_unchanged"),
        *[cnt(F.col(f"__chg_{c}"), f"changed_{c}") for c in compare_cols],
    )
