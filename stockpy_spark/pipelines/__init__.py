from stockpy_spark.pipelines.stocks import transform_stocks
from stockpy_spark.pipelines.news import transform_news

__all__ = ["transform_stocks", "transform_news"]
