"""Property test: scd2_history == a pure-Python per-key fold on random
change logs (keys, duplicate timestamps needing the tie-break, NULL
states, multi-key interleavings) — the same differential discipline as
the CDC fold property suite."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hummingbird_spark.operators.scd import scd2_history

T0 = datetime(2024, 3, 1)

# (key, ts_seconds, state) triples; small domains force collisions
events = st.tuples(
    st.integers(min_value=1, max_value=3),       # key
    st.integers(min_value=0, max_value=5),       # ts bucket (dups likely)
    st.sampled_from([None, "A", "B"]),           # state value
)


def _ref(rows):
    """Reference fold: per key, order by (ts, event_id), open a new
    version whenever the state differs (NULL-safe), then chain
    intervals."""
    by_key = {}
    for eid, (k, sec, val) in enumerate(rows):
        by_key.setdefault(k, []).append((T0 + timedelta(seconds=sec),
                                         eid, val))
    out = []
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        versions = []
        for ts, _eid, val in evs:
            if not versions or versions[-1][0] != val:
                versions.append([val, ts, 0])
            versions[-1][2] += 1
        for i, (val, start, n) in enumerate(versions):
            nxt = versions[i + 1][1] if i + 1 < len(versions) else None
            out.append((k, val, start, nxt, nxt is None, n))
    return sorted(out, key=_key)


def _key(t):
    # None-safe canonical order (str() is injective on these domains)
    return tuple((x is None, str(x)) for x in t)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(events, min_size=1, max_size=20))
def test_scd2_matches_reference_fold(spark, rows):
    df = spark.createDataFrame(
        [(eid, T0 + timedelta(seconds=sec), k, val)
         for eid, (k, sec, val) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, state string")
    got = sorted(
        ((r["user_id"], r["state"], r["valid_from"], r["valid_to"],
          r["is_current"], r["n_events"])
         for r in scd2_history(df, ["user_id"], "ts", ["state"],
                               order_cols=["event_id"]).collect()),
        key=_key)
    assert got == _ref(rows)
