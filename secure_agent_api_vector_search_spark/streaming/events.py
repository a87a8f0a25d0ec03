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


ANOMALY_OUTPUT_SCHEMA = (
    "event_type string, hour string, n long, mean_n double, z double, "
    "is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "cur_hour_us long, cur_n long, h long, s long, q long"

_HOUR_US = 3_600 * 1_000_000
_MAX_I64 = (1 << 63) - 1


def _anomaly_fold(z_thresh: float):
    import math

    import pandas as pd

    def fn(key, pdfs, state):
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        rows = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ts = rows["ts"].astype("datetime64[us]").astype("int64")
        buckets = (ts // _HOUR_US).value_counts().sort_index()
        if state.exists:
            cur_hour, cur_n, h, s, q = state.get
        else:
            cur_hour, cur_n, h, s, q = None, 0, 0, 0, 0
        out = []

        def close_hour():
            nonlocal h, s, q
            mean_n = s / h if h else 0.0
            if h > 1:
                var = (h * q - s * s) / (h * (h - 1))
                std = math.sqrt(var) if var > 0 else 0.0
            else:
                std = 0.0
            # Poisson floor: against a CONSTANT history the sample std
            # is 0 and no spike could ever score (the batch twin
            # doesn't need this — it includes the spike hour in its
            # own stats). sqrt(mean) is the natural count-data floor.
            denom = max(std, math.sqrt(mean_n) if mean_n > 0 else 0.0)
            z = (cur_n - mean_n) / denom if denom > 0.0 and h >= 2 else 0.0
            out.append(
                (
                    key[0],
                    pd.Timestamp(cur_hour * _HOUR_US, unit="us").strftime(
                        "%Y-%m-%d %H"
                    ),
                    cur_n,
                    mean_n,
                    z,
                    abs(z) > z_thresh,
                )
            )
            h, s, q = h + 1, s + cur_n, q + cur_n * cur_n

        for hour, n in buckets.items():
            if cur_hour is None or hour == cur_hour:
                cur_hour, cur_n = int(hour), cur_n + int(n)
            else:
                close_hour()
                cur_hour, cur_n = int(hour), int(n)
        # Python accumulates q exactly (arbitrary precision); the state
        # schema is int64, so serializing past 2^63-1 would silently
        # wrap, h*q - s*s could go negative, and the var>0 guard would
        # mute the alarm exactly at peak traffic. Fail loudly instead.
        if q > _MAX_I64 or s > _MAX_I64:
            raise OverflowError(
                f"anomaly_stream: exact-integer history for event_type "
                f"{key[0]!r} exceeded int64 (s={s}, q={q}, ~3e9 events/"
                f"hour ceiling) — shard the event type or rescale counts; "
                f"continuing would silently emit z=0"
            )
        state.update((cur_hour, cur_n, h, s, q))
        if out:
            yield pd.DataFrame(
                out,
                columns=["event_type", "hour", "n", "mean_n", "z", "is_anomaly"],
            )

    return fn


def anomaly_stream(stream: DataFrame, z_thresh: float = 2.0) -> DataFrame:
    """Streaming twin of operators/analytics.py::events_hourly_anomaly —
    the ONLINE form: per event_type, a custom
    ``applyInPandasWithState`` operator folds completed hours into
    running (count, sum, sum-of-squares) history and scores each hour
    AS IT COMPLETES against the history seen so far (the batch twin
    scores against the full-period stats; the online detector by
    construction only knows the past — both share the exact-integer
    H/S/Q formulation). An hour is 'completed' when a later hour's
    first event arrives for that type, the same in-order-across-batches
    regime as sessionize_stream; z = 0 until two hours of history
    exist or when traffic is constant.

    State is O(1) per event type (five int64s — the 100 TB shape:
    state scales with |types|, never |events|). q accumulates squared
    hourly counts in int64 (the batch twin widens to DECIMAL(38,0),
    but stateful-operator state schemas are primitive); the fold
    checks the bound at runtime and raises OverflowError past
    ~3e9 events/hour rather than letting the wrapped product zero the
    variance and silently mute the alarm at peak traffic — shard the
    event type or rescale counts to go past it. Output rows appear
    once per completed (type, hour).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _anomaly_fold(z_thresh),
            ANOMALY_OUTPUT_SCHEMA,
            ANOMALY_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
