from stockpy_spark.pipelines.connectors import (
    Connector,
    DriverFetchConnector,
    FrameConnector,
    LiteralConnector,
    distributed_fetch,
)
from stockpy_spark.pipelines.news import transform_news
from stockpy_spark.pipelines.news_extract import extract_news
from stockpy_spark.pipelines.stocks import transform_stocks
from stockpy_spark.pipelines.stocks_extract import extract_stocks, stock_dimension

__all__ = [
    "Connector",
    "DriverFetchConnector",
    "FrameConnector",
    "LiteralConnector",
    "distributed_fetch",
    "extract_news",
    "extract_stocks",
    "stock_dimension",
    "transform_news",
    "transform_stocks",
]
