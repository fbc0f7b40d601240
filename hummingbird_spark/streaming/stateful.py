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


# ---------------------------------------------------------------------------
# Event-time sessionization with custom close conditions
# ---------------------------------------------------------------------------

SESSION_OUTPUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
SESSION_STATE = "start timestamp, last_ts timestamp, n long, total double"


def _make_session_fn(gap_seconds: int):
    gap = pd.Timedelta(seconds=gap_seconds)

    def update(key, batches, state: GroupState):
        (user_id,) = key

        def row(start, end, n, total):
            return {"user_id": user_id, "session_start": start,
                    "session_end": end, "n_events": int(n),
                    "total_value": float(total)}

        if state.hasTimedOut:
            start, last_ts, n, total = state.get
            state.remove()
            yield pd.DataFrame([row(start, last_ts, n, total)])
            return

        events = pd.concat(list(batches)).sort_values("ts")
        closed = []
        cur = list(state.get) if state.exists else None
        for ts, value in zip(events["ts"], events["value"]):
            if cur is None:
                cur = [ts, ts, 0, 0.0]
            elif ts - cur[1] > gap:  # intra-batch gap closes a session
                closed.append(row(cur[0], cur[1], cur[2], cur[3]))
                cur = [ts, ts, 0, 0.0]
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            cur[3] += float(value)
        state.update(tuple(cur))
        # close via watermark: fire once event time passes last_ts+gap
        state.setTimeoutTimestamp(
            int(cur[1].timestamp() * 1000) + gap_seconds * 1000)
        yield pd.DataFrame(closed) if closed else pd.DataFrame(
            [], columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value"])

    return update


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark_delay: str = "10 seconds") -> DataFrame:
    """events(user_id, ts, value) stream -> CLOSED sessions, emitted
    when event time (the watermark) passes the session's last event by
    `gap_seconds` — sessionization with an event-time timeout, the
    applyInPandasWithState pattern the built-in session_window can't
    express once the close condition stops being a fixed gap (bound
    session length, value-triggered close, per-key gaps all slot into
    the same update function).

    State is one open session per live key (four scalars); closed
    sessions leave the store immediately, so state size tracks live
    keys, not history. Output is append-shaped (sessions emit exactly
    once, on close)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming SCD2 maintenance: closed validity intervals as they close
# ---------------------------------------------------------------------------

SCD2_OUTPUT = (
    "user_id long, state_value string, valid_from timestamp, "
    "valid_to timestamp, n_events long"
)
SCD2_STATE = "cur string, valid_from timestamp, n long"


def _scd2_update(key, batches, state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return

    events = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    cur = list(state.get) if state.exists else None
    closed = []
    for ts, val in zip(events["ts"], events["state_value"]):
        val = None if pd.isna(val) else val
        if cur is None:
            cur = [val, ts, 0]
        elif (val is None) != (cur[0] is None) or val != cur[0]:
            closed.append({
                "user_id": user_id, "state_value": cur[0],
                "valid_from": cur[1], "valid_to": ts,
                "n_events": int(cur[2]),
            })
            cur = [val, ts, 0]
        cur[2] += 1
    state.update(tuple(cur))
    yield pd.DataFrame(closed) if closed else pd.DataFrame(
        [], columns=["user_id", "state_value", "valid_from",
                     "valid_to", "n_events"])


def scd2_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts, state_value) stream -> CLOSED SCD2
    versions, emitted the moment a key's tracked value changes — the
    streaming maintenance of `operators/scd.py::scd2_history` (whose
    batch form builds the full table; this keeps it current without
    re-reading the log). The union of this stream's output with the
    per-key open state IS the SCD2 table at any instant.

    State per key is one open version (value, valid_from, n) — three
    scalars, not buffered events, so the store is bounded by live-key
    cardinality exactly like `running_user_state`. Events sort by
    (ts, event_id) within a micro-batch; ACROSS batches arrival order
    is the processing contract (the CDC source replays the oplog in
    order — ST6's per-key fold guarantee feeds this operator ordered
    input). NULL state values are versioned NULL-safely, matching the
    batch operator's eqNullSafe discipline.

    Output is append-shaped: each version emits exactly once, on
    close. Replaying a checkpointed batch re-emits the same closed
    versions (same sort, same state trajectory) — idempotent under
    the sink's batch-id ledger like every other CDC sink here."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _scd2_update,
            outputStructType=SCD2_OUTPUT,
            stateStructType=SCD2_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
