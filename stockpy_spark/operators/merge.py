"""Upsert / MERGE-INTO emulation on plain parquet.

The reference's daily cycle is read-modify-write of a day partition
(transform_stocks_job.py:211-213); the general form — new rows inserted,
colliding keys replaced — is SQL MERGE, which plain parquet lacks (it
needs a transactional table format: Delta/Iceberg/Hudi swap in here with
a native MERGE and row-level conflict handling). The relational
emulation is exact and scale-clean: one left-anti hash join on the key
(AQE-splittable, no skew amplification — the anti join only carries the
key column of the update side) plus a by-name union.

At 100 TB the pattern to avoid is rewriting the whole base table: pair
this with partition pruning — anti-join and rewrite ONLY the partitions
the update set touches (hive_fixture.run_incremental_cycle shows the
partition-granular variant with dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, updates: DataFrame, key: str | list[str]
) -> DataFrame:
    """Post-merge state: every ``updates`` row is present; ``base`` rows
    survive only when their key has no update (updates win on
    collision). Requires identical schemas (unionByName raises
    otherwise); duplicate keys WITHIN ``updates`` are kept as-is —
    dedupe upstream if the update feed can repeat keys."""
    keys = [key] if isinstance(key, str) else list(key)
    survivors = base.join(updates.select(*keys), keys, "left_anti")
    return survivors.unionByName(updates)


def scd2_history(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: consecutive rows with the SAME attribute value collapse into
    one version row (key, attr value, valid_from, valid_to, version);
    ``valid_to`` is the next version's valid_from, NULL on the current
    version — the standard SCD2 / gaps-and-islands compression.

    Ordering within a key is (ts, tiebreak) so duplicate timestamps
    stay deterministic. Implementation is the two-window island trick:
    a lag() flags value changes, a running sum of flags numbers the
    islands, one grouped min(ts) per island opens each version, and a
    lead() closes it. Every window/aggregate is partitioned by the
    dimension key — at 100 TB that is one shuffle on the key reused by
    all four steps (Spark plans them into a single sort+window chain),
    no driver state, no UDFs.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w_seq = Window.partitionBy(key_col).orderBy(*order)
    keep = [key_col, attr_col, ts_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    flagged = changes.select(*keep).withColumn(
        "__chg",
        F.when(
            F.lag(attr_col).over(w_seq).isNull()
            | (F.lag(attr_col).over(w_seq) != F.col(attr_col)),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "__ver",
        F.sum("__chg").over(
            w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = islands.groupBy(key_col, "__ver").agg(
        F.first(attr_col).alias("attr"),
        F.min(ts_col).alias("valid_from"),
    )
    w_ver = Window.partitionBy(key_col).orderBy("__ver")
    return versions.select(
        F.col(key_col),
        F.col("attr"),
        F.col("valid_from"),
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.col("__ver").cast("int").alias("version"),
    )
