"""Structured Streaming surface.

The reference engine is batch-iterative (its only 'stream' is a browser
SSE channel, ``cmd/client/main.go:97-141`` — UI plumbing, SURVEY §1.3), so
streaming is additive capability, not parity: windowed event aggregation
with watermarked late-data handling, plus gap-based sessionization usable
in both batch and streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_EPOCH_NTZ = "1970-01-01 00:00:00"


def epoch_micros_ntz(col: Column | str) -> Column:
    """Microseconds since epoch of a timestamp, independent of the session
    timezone: naive (NTZ) values are taken as-written — the same convention
    DuckDB's ``epoch()`` uses — instead of being interpreted in the session
    zone (which a plain ``cast('timestamp').cast('long')`` does, shifting
    results and even session boundaries across DST under non-UTC drivers).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def epoch_seconds_ntz(col: Column | str) -> Column:
    """Whole seconds since epoch (floor), NTZ-safe — see epoch_micros_ntz."""
    return F.floor(epoch_micros_ntz(col) / F.lit(1_000_000)).cast("long")


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Batch mode mirrors the streaming query exactly (same plan shape) so
    results are comparable; streaming adds the watermark for state expiry.
    """
    # parquet timestamps may be NTZ; watermarks require TIMESTAMP (ltz).
    # Cast in BOTH modes so batch and streaming outputs are comparable
    # (session timezone is pinned to UTC in get_spark).
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if streaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("total_value", 6).alias("total_value"),
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessions per user (batch): lag + cumulative sum over the
    per-user time order. → one row per session with bounds and counts.
    ``tiebreak_col`` makes the ordering total when timestamps can collide
    (required for cross-engine result parity)."""
    order = ["ts"] + ([tiebreak_col] if tiebreak_col else [])
    w = W.partitionBy(user_col).orderBy(*order)
    # microsecond-exact integer epoch, independent of session timezone
    # (a timestamp-LTZ hop would shift under non-UTC sessions and could
    # even change gaps across DST transitions)
    epoch = epoch_micros_ntz("ts")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > F.lit(int(gap_minutes) * 60 * 1_000_000)), 1
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return marked.groupBy(user_col, "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def stream_events_from_parquet(spark, path: str, schema=None) -> DataFrame:
    """readStream entry for a parquet directory (smoke/testing; production
    would be Kafka). Schema required by Structured Streaming."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization — the custom stateful operator
    the batch :func:`sessionize` can't express incrementally.

    ``applyInPandasWithState`` keeps ONE open session per user as state
    ``(start_us, last_us, n_events)``; each micro-batch folds its events
    into the open session, emits every session closed by a gap, and arms
    an event-time timeout at ``last_ts + gap`` so the watermark closes
    idle sessions without waiting for the user's next event. State is
    per-key and O(1) — at 100 TB/day event volume the state store holds
    one row per active user, not per event.

    Output (append mode): ``(user_id, session_start, session_end,
    n_events)`` — one row per CLOSED session; matches the batch
    :func:`sessionize` for every session the watermark has passed.
    """
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_us = int(gap_minutes) * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        uid = key[0]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [uid], "start_us": [start_us],
                 "end_us": [last_us], "n_events": [n]}
            )
            return
        ts_us = []
        for pdf in pdfs:
            # pandas datetime64[ns] → epoch micros (int64 view is NANOS)
            ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
        ts_us.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = n = None
        closed = []
        for t in ts_us:
            if n is None:  # no open session
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:  # gap: close, open fresh
                closed.append((uid, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:  # extend (a within-watermark late event only extends n)
                last_us, n = max(last_us, t), n + 1
        if n is not None:
            state.update((int(start_us), int(last_us), int(n)))
            # close the open session once the watermark passes last+gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "start_us", "end_us", "n_events"]
            )

    e = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    out = e.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, start_us long, end_us long, n_events long",
        stateStructType="start_us long, last_us long, n_events long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        "n_events",
    )
