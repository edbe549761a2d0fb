"""Structured Streaming twins of the batch operators (SURVEY.md §2.9).

The reference approximates streaming with daily partition batches; these
operators are the real streaming versions for the same semantics, over
any streaming source (files/Kafka). Tested with file sources + memory
sink driven synchronously via processAllAvailable().
"""

from stockpy_spark.streaming.ops import (
    windowed_agg,
    dedup_within_watermark,
    session_agg,
    run_to_memory,
)

__all__ = ["windowed_agg", "dedup_within_watermark", "session_agg", "run_to_memory"]
