"""The reference's transform_stocks job as a thin operator composition.

Reproduces /root/reference/scripts/transform_stocks_job.py:107-214
(requirements A+B+C of the challenge): clean -> rename to business names
-> per-sector aggregates attached -> per-ticker close delta -> partition
columns. Input shape = FIXTURES.md A1 (stocks_raw); output schema =
stocks_clean (transform_stocks_job.py:66-83).

Differences from the reference, on purpose (SURVEY.md §4.1):
- no eager count()/show() between stages — one lazy plan;
- per-sector stats via a single window shuffle instead of agg+back-join;
- sink is idempotent dynamic-partition-overwrite, not blind append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpy_spark.operators import (
    attach_group_stats_window,
    cast_columns,
    drop_columns,
    filter_not_null_positive,
    lag_delta,
    rename_columns,
)

RENAMES = {
    # en -> pt business names (transform_stocks_job.py:146-165)
    "ticker": "codigoAcao",
    "company": "nomeEmpresa",
    "date": "data",
    "close": "precoFechamento",
    "high": "precoMaximo",
    "low": "precoMinimo",
    "open": "precoAbertura",
    "volume": "volumeNegociacao",
    "sector": "setor",
}


def transform_stocks(raw: DataFrame) -> DataFrame:
    """stocks_raw -> stocks_clean (refined)."""
    df = cast_columns(
        raw,
        {
            "close": T.DoubleType(),
            "high": T.DoubleType(),
            "low": T.DoubleType(),
            "open": T.DoubleType(),
            "volume": T.LongType(),
        },
    ).withColumn("date", F.to_date("date", "yyyy-MM-dd"))
    df = filter_not_null_positive(df, not_null=["sector"], positive=["close", "volume"])
    df = rename_columns(df, RENAMES)
    # Requirement A: per-sector avg(close), sum(volume) on every row
    df = attach_group_stats_window(
        df,
        ["setor"],
        {
            "mediaFechamento": F.avg("precoFechamento"),
            "totalVolume": F.sum("volumeNegociacao"),
        },
    )
    # Requirement C: close delta vs previous day per ticker
    df = lag_delta(
        df,
        "precoFechamento",
        ["codigoAcao"],
        ["data"],
        prev_name="fechamentoAnterior",
        delta_name="variacaoFechamento",
    )
    return drop_columns(df, [])
