"""SCD2 history builder (operators/scd.py): version boundaries,
unchanged-state collapse, NULL-safe change detection, interval
chaining."""

from __future__ import annotations

from datetime import datetime

from hummingbird_spark.operators.scd import scd2_history


def _log(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d), u, s) for i, (d, u, s) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, state string")


def _hist(df):
    return scd2_history(df, ["user_id"], "ts", ["state"],
                        order_cols=["event_id"])


def test_collapse_and_intervals(spark):
    # user 1: X X Y Y X  -> versions X(2) Y(2) X(1)
    df = _log(spark, [(1, 1, "X"), (2, 1, "X"), (3, 1, "Y"),
                      (4, 1, "Y"), (5, 1, "X")])
    h = sorted(_hist(df).collect(), key=lambda r: r["valid_from"])
    assert [(r["state"], r["n_events"]) for r in h] == \
        [("X", 2), ("Y", 2), ("X", 1)]
    # intervals chain: valid_to[i] == valid_from[i+1]; only last open
    for a, b in zip(h, h[1:]):
        assert a["valid_to"] == b["valid_from"] and not a["is_current"]
    assert h[-1]["is_current"] and h[-1]["valid_to"] is None
    assert h[0]["valid_from"] == datetime(2024, 1, 1)


def test_no_collapse_mode(spark):
    df = _log(spark, [(1, 1, "X"), (2, 1, "X"), (3, 1, "Y")])
    h = scd2_history(df, ["user_id"], "ts", ["state"],
                     order_cols=["event_id"], collapse_unchanged=False)
    assert h.count() == 3
    assert h.filter("is_current").count() == 1


def test_null_safe_change_detection(spark):
    # NULL NULL A NULL: NULL->NULL same version, NULL->A and A->NULL change
    df = _log(spark, [(1, 1, None), (2, 1, None), (3, 1, "A"),
                      (4, 1, None)])
    h = sorted(_hist(df).collect(), key=lambda r: r["valid_from"])
    assert [(r["state"], r["n_events"]) for r in h] == \
        [(None, 2), ("A", 1), (None, 1)]


def test_keys_are_independent(spark):
    df = _log(spark, [(1, 1, "X"), (2, 2, "X"), (3, 1, "Y"), (4, 2, "X")])
    h = _hist(df)
    assert h.filter("user_id = 1").count() == 2
    assert h.filter("user_id = 2").count() == 1
    assert h.filter("is_current").count() == 2


def test_same_ts_ordered_by_tiebreak(spark):
    # two events at the same ts: event_id orders them, so the state
    # sequence is X (id 0) then Y (id 1) -> two versions, Y current
    rows = [(0, datetime(2024, 1, 1), 1, "X"),
            (1, datetime(2024, 1, 1), 1, "Y")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, state string")
    h = _hist(df)
    cur = h.filter("is_current").collect()
    assert len(cur) == 1 and cur[0]["state"] == "Y"


def test_event_count_conserved(spark):
    df = _log(spark, [(d, u, s) for d, u, s in
                      [(1, 1, "X"), (2, 1, "X"), (3, 1, "Y"),
                       (1, 2, "A"), (2, 2, "B")]])
    h = _hist(df)
    total = sum(r["n_events"] for r in h.collect())
    assert total == df.count()
