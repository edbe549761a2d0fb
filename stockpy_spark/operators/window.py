"""Window-family operators (SURVEY.md §2.5 W1/W2 + the frame family the
challenge PDF names: rolling mean, ranking, running totals, sessions).

One shuffle per distinct (partition keys) spec; operators taking the same
keys/order compose into a single Window exchange when chained.
Order columns should form a total order within each partition — ties make
lag/rolling results nondeterministic (the oracle queries always add a
unique tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _w(keys: list[str], order_by: list[str]):
    return Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])


def lag_delta(
    df: DataFrame,
    value: str,
    keys: list[str],
    order_by: list[str],
    prev_name: str = "prev_value",
    delta_name: str = "delta",
    keep_prev: bool = False,
) -> DataFrame:
    """W1+W2 — previous value per key and the delta against it
    (reference: lag(close) per ticker ordered by date, then
    variacaoFechamento = close - prev, transform_stocks_job.py:193-198).
    First row per key gets NULL prev and NULL delta."""
    out = df.withColumn(prev_name, F.lag(value).over(_w(keys, order_by)))
    out = out.withColumn(delta_name, F.col(value) - F.col(prev_name))
    return out if keep_prev else out.drop(prev_name)


def rolling_mean(
    df: DataFrame,
    value: str,
    keys: list[str],
    order_by: list[str],
    window_rows: int,
    out_name: str = "rolling_mean",
) -> DataFrame:
    """Moving average over the trailing ``window_rows`` rows (inclusive)."""
    w = _w(keys, order_by).rowsBetween(-(window_rows - 1), Window.currentRow)
    return df.withColumn(out_name, F.avg(value).over(w))


def row_number_in_group(
    df: DataFrame, keys: list[str], order_by: list, out_name: str = "rn"
) -> DataFrame:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return df.withColumn(
        out_name, F.row_number().over(Window.partitionBy(*keys).orderBy(*cols))
    )


def topk_per_group(df: DataFrame, keys: list[str], order_by: list, k: int) -> DataFrame:
    """Top-k rows per group by ``order_by`` (pass Column.desc() for
    descending). row_number-based: exact, deterministic given a total
    order."""
    return row_number_in_group(df, keys, order_by, "__rn").filter(
        F.col("__rn") <= k
    ).drop("__rn")


def running_sum(
    df: DataFrame, value: str, keys: list[str], order_by: list[str], out_name: str = "running_sum"
) -> DataFrame:
    w = _w(keys, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_name, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap_seconds: int,
    session_name: str = "session_id",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (per key) exceeds ``gap_seconds``. session_id is a
    per-key running count starting at 1. Single window shuffle; the
    streaming twin is ``F.session_window`` (streaming/ops.py).
    ``order_by`` defaults to [ts]; pass extra tiebreak columns for
    determinism under equal timestamps."""
    w = _w(keys, order_by or [ts])
    prev_ts = F.lag(ts).over(w)
    # Cast through TIMESTAMP: parquet timestamps without a UTC flag read
    # as TIMESTAMP_NTZ (Spark 4 default), which cannot cast straight to
    # BIGINT. NTZ->TIMESTAMP uses the session tz (pinned UTC), and the
    # gap is a difference so any fixed tz cancels out anyway.
    gap = F.col(ts).cast("timestamp").cast("long") - prev_ts.cast(
        "timestamp"
    ).cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_name,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
