"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-user running profile (event count, value sum, last-seen) that
survives across micro-batches in the state store.

This is the (b)-tier escape hatch from the build rules: the semantics
(arbitrary per-key accumulators with timeout-based eviction) are not
expressible with built-in windowed aggregates. The Python hop is
per-group and Arrow-batched.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_seen_us long"
STATE_SCHEMA = "n_events long, total_value double, last_seen_us long"


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, total_value, last_seen = state.get
    else:
        n_events, total_value, last_seen = 0, 0.0, 0
    for pdf in pdfs:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
        if len(pdf):
            last_seen = max(last_seen, int(pdf["ts_us"].max()))
    state.update((n_events, total_value, last_seen))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n_events,
                "total_value": total_value,
                "last_seen_us": last_seen,
            }
        ]
    )


def user_profiles_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ``ts`` timestamp) → continuously updated
    per-user profiles."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long"
)
# open-session accumulator: first/last event time + count
SESSION_STATE_SCHEMA = "start_us long, last_us long, n_events long"

_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom sessionizer with EVENT-TIME TIMEOUT eviction: closed
    sessions (a later event opened a new one) emit immediately; the
    trailing open session parks in the state store with a timeout at
    ``last + gap`` and is flushed by the no-data batch once the
    watermark passes it — the applyInPandasWithState timeout path no
    other operator in this repo exercises."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "start_us": start,
            "end_us": last + _GAP_US, "n_events": n,
        }])
        return
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["ts_us"])
    ts.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    out = []
    for t in ts:
        if last is not None and t - last >= _GAP_US:
            out.append({"user_id": user_id, "start_us": start,
                        "end_us": last + _GAP_US, "n_events": n})
            start, last, n = t, t, 1
        else:
            start = t if start is None else start
            last, n = t, n + 1
    state.update((start, last, n))
    # fire when the event-time watermark passes the open session's gap
    state.setTimeoutTimestamp((last + _GAP_US) // 1000)  # ms epoch
    if out:
        yield pd.DataFrame(out)


def timeout_sessions_stream(events: DataFrame, ) -> DataFrame:
    """events (streaming, ``ts`` + watermark applied here) → per-user
    session summaries; see :func:`_sessionize` for the emission
    contract."""
    from pyspark.sql import functions as F

    # the watermarked timestamp column must survive the projection —
    # EventTimeTimeout resolves the watermark from the child's
    # event-time column, and dropping it is an AnalysisException
    prepared = events.withWatermark("ts", "2 hours").select(
        "user_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
