from stockpy_spark.plans.pipeline import Pipeline, Stage
from stockpy_spark.plans.stepfunctions import (
    parse_state_machine,
    pipeline_from_state_machine,
)

__all__ = [
    "Pipeline",
    "Stage",
    "parse_state_machine",
    "pipeline_from_state_machine",
]
