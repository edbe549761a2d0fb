"""Set operators (SURVEY.md §2.7).

The reference aligns schemas by hand (transform_news_job.py:52-84) before
what is morally a union; ``union_by_name`` with allowMissingColumns is the
engine-native version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_by_name(
    *dfs: DataFrame, allow_missing_columns: bool = True
) -> DataFrame:
    """By-name union of N frames; missing columns become NULL."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing_columns)
    return out
