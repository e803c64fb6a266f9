"""Event-time streaming analytics over the events stream.

The reference has no windowed/late-data logic (SURVEY.md §2.9), but the
engine exposes the full Structured Streaming surface as part of the generic
capability set:

- tumbling-window aggregation with a watermark (late rows beyond the
  watermark are dropped);
- custom stateful sessionization via applyInPandasWithState — the
  streaming twin of the batch `user_sessions` query.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def hourly_event_counts(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type with watermarked
    late-data handling. Works on both streaming and batch DataFrames.

    Scale: streaming state is bounded by the watermark horizon; partial
    aggregation happens before the state-store shuffle.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("hour_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def correlate_streams_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_s: int = 60,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: pairs with the same ``key`` whose event
    times differ by at most ``tolerance_s`` — the streaming twin of
    operators/temporal.range_join_within. Right-side columns come back
    suffixed ``_r``.

    Both sides get watermarks and the join carries an event-time range
    condition, which is exactly what lets Spark bound the join state: a
    buffered row is dropped once the other side's watermark passes its
    ts + tolerance. Works on batch DataFrames too (plain equi+range join).
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = r.select(*[F.col(c).alias(f"{c}_r") for c in r.columns])
    tol = F.expr(f"INTERVAL {int(tolerance_s)} SECONDS")
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts) - tol)
        & (F.col(f"{right_ts}_r") <= F.col(left_ts) + tol)
    )
    return l.join(r, cond)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first event per key, with state
    bounded by the watermark horizon (dropDuplicatesWithinWatermark —
    duplicates arriving within the watermark window are suppressed, state
    for older keys is GC'd; an unbounded dropDuplicates would grow state
    forever at 100 TB/day rates).

    The streaming twin of operators/dedup.exact_dedup; works on batch
    DataFrames too (plain dropDuplicates, same result set).
    """
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)

SESSION_GAP_S = 1800.0


def _us_ts(seconds: float) -> pd.Timestamp:
    """Microsecond-precision timestamp (Arrow-safe; Spark timestamps are us)."""
    return pd.Timestamp(int(seconds * 1_000_000), unit="us")


# Processing-time state timeout: how long a user may be silent before the
# open tail session is flushed and state GC'd. Continuous deployments use
# the session gap; availableNow/batch-style runs want a short flush so the
# query can terminate promptly after the last input batch.
DEFAULT_TIMEOUT_MS = int(SESSION_GAP_S * 1000)


def _make_sessionize_group(timeout_ms: int):
    """Closure factory: the timeout rides inside the pickled function so it
    reaches executor workers (module globals would not)."""

    def _sessionize_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Stateful session assembly for one user: a session closes when no
        event arrives within SESSION_GAP_S (processing-time timeout closes the
        tail session)."""
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                sid, n, start_ts, last_ts = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_id": [sid],
                        "n_events": [n],
                        "session_start": [_us_ts(start_ts)],
                        "session_end": [_us_ts(last_ts)],
                    }
                )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts = rows["ts"].astype("int64") / 1e9  # seconds

        if state.exists:
            sid, n, start_ts, last_ts = state.get
        else:
            sid, n, start_ts, last_ts = 0, 0, None, None

        closed: list[tuple] = []
        for t in ts:
            if last_ts is not None and t - last_ts > SESSION_GAP_S:
                closed.append((sid, n, start_ts, last_ts))
                sid, n, start_ts = sid + 1, 0, None
            if start_ts is None:
                start_ts = t
            n += 1
            last_ts = t

        state.update((sid, n, start_ts, last_ts))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": [_us_ts(c[2]) for c in closed],
                    "session_end": [_us_ts(c[3]) for c in closed],
                }
            )

    return _sessionize_group


def sessionize_stream(
    events: DataFrame, timeout_ms: int = DEFAULT_TIMEOUT_MS
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization per user over a
    stream (applyInPandasWithState, Arrow-batched).

    ``timeout_ms``: processing-time lull after which the open tail session
    flushes (state GC). Use a small value with availableNow triggers so the
    final cleanup batch fires promptly instead of idling a full gap.

    LIMITATION (loud, by design): under trigger(availableNow=True) a
    ProcessingTimeTimeout query does NOT self-terminate — after the input
    exhausts, Spark keeps running empty cleanup batches (which is also what
    lets the timeouts fire and the tail sessions flush). For batch-style
    runs, pair with :func:`drain_available_now`, which watches the state
    store and stops the query once every session has flushed. A continuous
    deployment never hits this: the query is meant to stay up.

    Scale: state is one tiny tuple per active user, partitioned by user_id;
    timeouts bound state growth.
    """
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_group(timeout_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def drain_available_now(query, poll_s: float = 1.0, max_wait_s: float = 600.0) -> bool:
    """Explicit drain for availableNow runs of a stateful query: wait until
    all input is processed AND the state store is empty (every timeout has
    fired, every tail session flushed), then stop the query.

    Progress-driven, not sleep-calibrated: polls
    ``lastProgress.stateOperators[].numRowsTotal`` — the authoritative
    count of live state rows. Returns True when drained (or the query
    terminated by itself), False if ``max_wait_s`` elapsed first (the query
    is stopped either way).
    """
    import time

    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        if query.awaitTermination(poll_s):
            return True
        progress = query.lastProgress
        if not progress:
            continue
        ops = progress.get("stateOperators") or []
        state_rows = sum(o.get("numRowsTotal", 0) for o in ops)
        if ops and state_rows == 0 and not query.status.get("isDataAvailable", True):
            query.stop()
            return True
    query.stop()
    return False
