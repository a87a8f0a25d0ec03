"""Event-stream temporal analytics ([EXT], SURVEY.md §2.9): windowed
aggregation with watermarked late-data handling. The custom stateful
operator (applyInPandasWithState sessionization) lives in sessions.py.

Batch twin: operators/analytics.py `events_hourly` computes the same
rollup over the static table — tests assert batch/stream agreement,
which is the Structured Streaming correctness contract (a stream is an
incrementally-computed view of the same relational query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark
    bounding state for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )
