"""Combined query registry: reference parity + scale extensions.

QUERIES maps name -> spark_fn (spark, sf_dir) -> DataFrame.
ORACLES maps name -> ANSI SQL for DuckDB (absent => rows-only check).
"""

from __future__ import annotations

from stockpy_spark.registry_core import CORE_QUERIES

try:
    from stockpy_spark.registry_ext import EXT_QUERIES
except ImportError:  # extensions land incrementally
    EXT_QUERIES = {}

_ALL = {**CORE_QUERIES, **EXT_QUERIES}

QUERIES = {name: fn for name, (fn, _sql) in _ALL.items()}
ORACLES = {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
