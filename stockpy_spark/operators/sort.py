"""Sort/limit operators (SURVEY.md §2.6 O1-O3).

``top_k`` plans as TakeOrderedAndProject — per-partition heap of k rows,
merged on the driver. No global sort materializes, which is the only
acceptable top-k at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list, k: int, descending: bool = True) -> DataFrame:
    """O1 — ORDER BY ... LIMIT k (reference: queries.sql:2,6,11,16).
    Include a unique tiebreak column in ``order_by`` for deterministic
    results."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if descending:
        cols = [c.desc() for c in cols]
    return df.orderBy(*cols).limit(k)
