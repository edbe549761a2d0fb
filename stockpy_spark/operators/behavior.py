"""User-behavior analytics: ordered funnels and cohort retention.

Classic product-analytics operators over an event stream — the shapes a
warehouse user runs daily. Both are pure relational compositions
(grouped conditional aggregates + joins), no UDFs, and both are exactly
replayable by a SQL oracle: timestamps compare bit-identically and the
only floats are none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the timestamp at which each
    funnel step was first completed IN ORDER (step i counts only at the
    earliest event of that type strictly after step i-1's completion),
    plus ``stage`` = number of steps completed. Returns
    (user_col, stage, t1..tN).

    Scale shape: one grouped aggregate per step — pass i computes
    min(ts) WHERE type = steps[i] AND ts > t_{i-1} via a conditional
    aggregate after joining the previous pass's per-user frame (keyed,
    co-partitioned joins on the user key; the per-user frames are tiny
    relative to the event stream). len(steps) passes total, no windows,
    no per-user sorting — at 100 TB each pass is a map-side-combined
    shuffle on the same key, and AQE reuses the exchange.
    """
    out: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        ev = events.select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("__t"),
            F.col(ts_col).alias("__ts"),
        )
        if out is None:
            cur = ev.filter(F.col("__t") == step).groupBy("__u").agg(
                F.min("__ts").alias(f"t{i}")
            )
            out = cur
        else:
            prev_col = f"t{i - 1}"
            cur = (
                ev.join(out.select("__u", prev_col), "__u")
                .filter(
                    (F.col("__t") == step) & (F.col("__ts") > F.col(prev_col))
                )
                .groupBy("__u")
                .agg(F.min("__ts").alias(f"t{i}"))
            )
            out = out.join(cur, "__u", "left")
    # stage = deepest completed step: walk from the back, first non-null wins
    stage = F.coalesce(
        *[
            F.when(F.col(f"t{i}").isNotNull(), F.lit(i))
            for i in range(len(steps), 0, -1)
        ],
        F.lit(0),
    )
    return out.select(
        F.col("__u").alias(user_col),
        stage.alias("stage"),
        *[F.col(f"t{i}") for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the ``grain`` of their
    first-ever event (the cohort), counted once per (cohort, activity
    period) they return in. Returns (cohort, period, n_users).

    Scale shape: first-seen is one grouped min over the stream; the
    activity matrix is a distinct over (user, period) — both map-side
    combined on the user key — joined to the tiny per-user cohort frame
    and re-aggregated over the (cohort, period) grid, whose cardinality
    is weeks^2, not users.
    """
    cohorts = (
        events.groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__first"))
        .select("__u", F.date_trunc(grain, "__first").alias("cohort"))
    )
    active = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(grain, F.col(ts_col)).alias("period"),
    ).distinct()
    return (
        active.join(cohorts, "__u")
        .groupBy("cohort", "period")
        .agg(F.countDistinct("__u").alias("n_users"))
    )
