"""Single-split guard for CPU-dense narrow stages (guide §2.5 "input
skew": one small unsplittable input serializes a whole stage).

A small parquet file reads as ONE input split, so a narrow stage whose
cost is per-row CPU (codec decode, per-token hashing, shingle
explodes) runs the whole corpus on one core regardless of cluster
width. ``spread_small_input`` repartitions such an input to
``defaultParallelism`` — a ~KB-to-MB shuffle that buys full-width CPU —
and is a NO-OP whenever the input already carries enough splits (the
real 100 TB case) or already carries a shuffle (its parallelism is the
planner's business, and probing it would pay the shuffle twice, see
below).

This generalizes the r15 payload-generator guard
(operators/multimodal.py) to the text/dedup family; multimodal now
imports from here. Two r15-advisor robustness items are folded in:

1. The probe-skip recognizes ANY shuffle-bearing plan, not only
   explicit Repartition nodes: under AQE, the ``df.rdd`` partition
   probe MATERIALIZES every shuffle already in the plan, so a probe
   over a join/aggregate input would execute those stages as a
   throwaway job and pay their shuffles twice (the r15 bench ledger
   caught exactly this class as a doubled shuffle-byte entry). Inputs
   with upstream shuffles are therefore returned untouched — their
   post-shuffle parallelism is AQE's decision, and callers that need a
   CPU-width guarantee there should repartition explicitly after a
   pin (see ``spread_pinned``).
2. The plan inspection walks logical-plan NODE CLASS NAMES via py4j
   instead of regexing the pretty-printed string (node spellings are
   not a stable API), and any failure to inspect (e.g. a Connect-style
   session with no ``_jdf``) degrades to returning the input unchanged
   — never to a wrong probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Logical nodes that plan to a shuffle (or are an explicit
#: repartition). Presence of any of these means the .rdd probe is not
#: free under AQE — skip it. Narrow nodes (Project/Filter/Generate/
#: LocalLimit/SubqueryAlias/...) are absent on purpose: a plan made
#: only of those over a scan has static partitioning and the probe
#: costs nothing.
_SHUFFLE_BEARING = frozenset(
    {
        "RepartitionByExpression",
        "RebalancePartitions",
        "Join",
        "Aggregate",
        "Window",
        "WindowGroupLimit",
        "Sort",
        "Deduplicate",
        "DeduplicateWithinWatermark",
        "Intersect",
        "Except",
        "GlobalLimit",
        "CoGroup",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsInArrow",
        "MapGroups",
    }
)


def _plan_has_shuffle(df: DataFrame) -> bool | None:
    """True if the analyzed logical plan contains a shuffle-bearing
    node (including an explicit shuffle repartition), False if it is
    narrow-over-scan, None when the plan cannot be inspected (treat as
    shuffle-bearing: never probe what we cannot see)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            name = node.getClass().getSimpleName()
            if name in _SHUFFLE_BEARING:
                return True
            if name == "Repartition":
                # df.repartition(n) -> shuffle=true (already spread);
                # df.coalesce(n) -> shuffle=false (narrows the input,
                # carries nothing for the probe to materialize) — keep
                # walking its child.
                if node.shuffle():
                    return True
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        return False
    except Exception:
        return None


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition a narrow-over-scan input to defaultParallelism when
    it carries fewer splits; pass through streaming, shuffle-bearing,
    or uninspectable inputs untouched (see module docstring)."""
    if df.isStreaming:
        return df
    if _plan_has_shuffle(df) is not False:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def probe_free_partitions(df: DataFrame) -> int | None:
    """The input's partition count when probing it is FREE — i.e. the
    plan carries no shuffle for the ``.rdd`` probe to materialize
    under AQE (a pinned frame's leaf RDD scan, or narrow-over-scan) —
    else None. Callers use this to derive data-proportional widths
    (e.g. a bounded-batch delta write's task count) without ever
    paying a throwaway job for the answer."""
    if df.isStreaming:
        return None
    if _plan_has_shuffle(df) is not False:
        return None
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def spread_pinned(df: DataFrame) -> DataFrame:
    """Width guard for a just-PINNED frame (operators/pinning.pin):
    after a localCheckpoint/checkpoint the plan is a leaf RDD scan, so
    the partition probe is free by construction — no shuffle exists to
    materialize. AQE sizes post-shuffle partitions by BYTES
    (~1 MB floor), so a byte-light but CPU-dense pinned frame (a combo
    census, a cleaned corpus) comes out of its materializing shuffle
    with a handful of partitions and every downstream narrow stage
    serializes; this adds one tiny repartition when (and only when)
    that happened. Identical subtrees downstream reuse the exchange,
    so fan-out consumers pay the spread shuffle once."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
