"""Operator library: pure DataFrame -> DataFrame transforms.

One module per SURVEY.md §2 family; extensions (dedup, similarity, text,
multimodal) are first-class citizens alongside reference parity.
"""

from stockpy_spark.operators.project import (
    select_with_conditional_cast,
    rename_columns,
    add_literal_column,
    align_to_columns,
    drop_columns,
    cast_columns,
)
from stockpy_spark.operators.filters import (
    filter_not_null_positive,
    filter_cross_column_equal,
    drop_na_subset,
)
from stockpy_spark.operators.joins import (
    dim_preserving_enrich,
    enrich_left_join,
    attach_group_stats,
    attach_group_stats_window,
    semi_join,
    anti_join,
    asof_join,
)
from stockpy_spark.operators.aggregate import (
    group_summary,
    distinct_rows,
    dedup_by_key_first,
    dedup_by_key_any,
    rollup_summary,
    cube_summary,
    pivot_summary,
)
from stockpy_spark.operators.window import (
    lag_delta,
    rolling_mean,
    row_number_in_group,
    topk_per_group,
    running_sum,
    sessionize,
)
from stockpy_spark.operators.sort import top_k
from stockpy_spark.operators.setops import union_by_name

__all__ = [
    "select_with_conditional_cast",
    "rename_columns",
    "add_literal_column",
    "align_to_columns",
    "drop_columns",
    "cast_columns",
    "filter_not_null_positive",
    "filter_cross_column_equal",
    "drop_na_subset",
    "dim_preserving_enrich",
    "enrich_left_join",
    "attach_group_stats",
    "attach_group_stats_window",
    "semi_join",
    "anti_join",
    "asof_join",
    "group_summary",
    "distinct_rows",
    "dedup_by_key_first",
    "dedup_by_key_any",
    "rollup_summary",
    "cube_summary",
    "pivot_summary",
    "lag_delta",
    "rolling_mean",
    "row_number_in_group",
    "topk_per_group",
    "running_sum",
    "sessionize",
    "top_k",
    "union_by_name",
]
