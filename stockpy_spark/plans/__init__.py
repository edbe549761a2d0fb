from stockpy_spark.plans.pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
