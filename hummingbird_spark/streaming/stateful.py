"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics the built-in stateful operators
(windows, dropDuplicates, stream-stream joins) can't express.

`running_user_state` keeps a per-key running aggregate ACROSS
micro-batches (count, sum, last event time) with a processing-time
timeout that expires idle keys and emits a final tombstone row — the
pattern behind sessionization with custom close conditions, per-entity
CDC materialization without a lakehouse, and streaming feature stores.

State discipline at scale: state is one small row per live key (three
numbers), not buffered events; expired keys are dropped by the timeout,
so the state store is bounded by the live-key cardinality.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "last_ts timestamp, expired boolean"
)
STATE_SCHEMA = "n long, total double, last_ts timestamp"

# idle-key expiry (worker idle backoff analogue, worker.go:48); long
# enough that batch-test queries never race it
IDLE_TIMEOUT_MS = 10 * 60 * 1000


def _update_user_state(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, last_ts = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n, "total_value": total,
            "last_ts": last_ts, "expired": True,
        }])
        return

    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n, "total_value": total,
        "last_ts": last_ts, "expired": False,
    }])


def running_user_state(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) stream -> per-user running aggregate,
    updated each micro-batch, expiring after 60 s idle."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
