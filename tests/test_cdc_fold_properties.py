"""Property-based test for the CDC per-key ordered fold
(streaming/cdc.py::reduce_write_models): for ANY event sequence and ANY
initial target state, applying the single reduced write model must give
the same final state as replaying every event in order one at a time
(BulkWriteOplogs' ordered-bulk semantics, oplog_utils.go:110-197).

The naive replayer here is written independently of _KeyFold — it
models a MongoDB target document directly — so agreement is evidence,
not circularity.
"""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hummingbird_spark.streaming.cdc import _MODEL_SCHEMA, reduce_write_models

T0 = dt.datetime(2024, 1, 1)
FIELDS = ["x", "y", "z"]

# one event = (kind, payload)
events = st.one_of(
    st.builds(lambda d: ("replace", d),
              st.dictionaries(st.sampled_from(FIELDS),
                              st.integers(0, 9), max_size=3)),
    st.just(("delete", None)),
    st.builds(
        lambda sets, unsets: ("patch", (sets, unsets)),
        st.dictionaries(st.sampled_from(FIELDS), st.integers(0, 9),
                        max_size=2),
        st.lists(st.sampled_from(FIELDS), unique=True, max_size=2),
    ),
)


def naive_replay(state, seq):
    """Apply each event in order to a target-document state
    (None = key absent from the target)."""
    for kind, payload in seq:
        if kind == "delete":
            state = None
        elif kind == "replace":
            state = dict(payload)
        else:  # patch: UpdateOne — no-op when the key is absent
            if state is None:
                continue
            sets, unsets = payload
            state = dict(state)
            state.update(sets)
            for f in unsets:
                state.pop(f, None)
    return state


def apply_reduced(state, row):
    """Apply one reduced write model (the merge's semantics)."""
    if row is None:  # key produced no model
        return state
    if row.action == "delete":
        return None
    if row.action == "replace":
        return json.loads(row.doc)
    # patch
    if state is None:
        return None
    state = dict(state)
    state.update(json.loads(row.set_json) if row.set_json else {})
    for f in (json.loads(row.unset_json) if row.unset_json else {}):
        state.pop(f, None)
    return state


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seqs=st.lists(st.lists(events, min_size=1, max_size=7),
                     min_size=1, max_size=3))
def test_reduced_model_equals_ordered_replay(spark, seqs):
    rows = []
    for key_idx, seq in enumerate(seqs):
        for pos, (kind, payload) in enumerate(seq):
            doc = set_json = unset_json = None
            if kind == "replace":
                doc = json.dumps(payload)
            elif kind == "patch":
                sets, unsets = payload
                set_json = json.dumps(sets) if sets else None
                unset_json = json.dumps(dict.fromkeys(unsets, 1)) \
                    if unsets else None
            rows.append((
                "db.c", str(key_idx), T0 + dt.timedelta(seconds=pos),
                pos, kind, doc, set_json, unset_json,
            ))
    models = spark.createDataFrame(rows, _MODEL_SCHEMA)
    reduced = {r.key: r for r in reduce_write_models(models).collect()}

    for key_idx, seq in enumerate(seqs):
        for initial in (None, {"x": 100, "w": -1}):
            want = naive_replay(initial, seq)
            got = apply_reduced(initial, reduced.get(str(key_idx)))
            assert got == want, (
                f"key {key_idx} initial={initial} seq={seq}: "
                f"reduced-apply={got} replay={want}"
            )
