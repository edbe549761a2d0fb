"""stockpy_spark — a PySpark-native analytics engine.

A clean, testable, local-first engine library re-expressing the operator
surface of the reference batch-ETL pipeline (LucasTechAI/StockPy, surveyed
in SURVEY.md) as composable, schema-checked PySpark transforms, plus
scale-designed LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis).

Design stance (SURVEY.md §7): idiomatic-Spark-first *library*, not a
framework. Every operator is a pure ``DataFrame -> DataFrame`` function;
Catalyst is the only optimizer. Nothing here hand-schedules what the
optimizer already does — operators declare logical plans and rely on
predicate pushdown, column pruning, partition pruning, broadcast joins,
partial aggregation and AQE.
"""

from stockpy_spark.session import get_spark, spark_conf_defaults

__all__ = ["get_spark", "spark_conf_defaults"]
__version__ = "0.1.0"
