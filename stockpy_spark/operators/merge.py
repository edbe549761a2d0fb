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
