"""applyInPandasWithState: per-key state carried ACROSS micro-batches."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

from pyspark.sql import types as T

from hummingbird_spark.streaming.stateful import running_user_state

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])

T0 = dt.datetime(2024, 6, 1)


def _write(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for sec, uid, val in rows:
            f.write(json.dumps({
                "ts": (T0 + dt.timedelta(seconds=sec)).strftime(
                    "%Y-%m-%dT%H:%M:%S.000Z"),
                "user_id": uid, "value": val,
            }) + "\n")


def test_state_carries_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    _write(src, "0.json", [(1, 1, 10.0), (2, 1, 5.0), (3, 2, 1.0)])

    sink1 = str(tmp_path / "sink1")

    def run(sink):
        # foreachBatch: update-mode rows appended per batch; supports
        # checkpoint recovery (memory/parquet sinks don't, for
        # update-mode stateful queries)
        def write(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            running_user_state(spark.readStream.schema(SCHEMA).json(src))
            .writeStream.foreachBatch(write)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        # a stateful query with ProcessingTimeTimeout stays alive to
        # service future timeouts even under availableNow —
        # processAllAvailable() never returns, and awaitTermination only
        # times out. Poll for the committed data batch, then stop.
        deadline = time.time() + 180
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] > 0:
                break
            time.sleep(0.5)
        else:
            q.stop()
            raise AssertionError("no data batch committed within 180s")
        q.stop()

    run(sink1)
    rows = spark.read.parquet(sink1).filter("NOT expired").collect()
    s1 = {r.user_id: r for r in rows}
    assert s1[1].n_events == 2 and s1[1].total_value == 15.0
    assert s1[2].n_events == 1

    # second run: state must CONTINUE from the checkpointed values
    _write(src, "1.json", [(10, 1, 2.5), (11, 3, 7.0)])
    sink2 = str(tmp_path / "sink2")
    run(sink2)
    s2 = {r.user_id: r for r in
          spark.read.parquet(sink2).filter("NOT expired").collect()}
    assert s2[1].n_events == 3 and s2[1].total_value == 17.5  # carried
    assert s2[3].n_events == 1  # new key
    assert 2 not in s2  # untouched key emits nothing in update mode


SCD2_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("state_value", T.StringType()),
])


def _write_scd2(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for sec, uid, eid, val in rows:
            f.write(json.dumps({
                "ts": (T0 + dt.timedelta(seconds=sec)).strftime(
                    "%Y-%m-%dT%H:%M:%S.000Z"),
                "user_id": uid, "event_id": eid, "state_value": val,
            }) + "\n")


def test_scd2_stream_closes_versions_across_batches(spark, tmp_path):
    """scd2_stream emits a closed validity interval the moment a key's
    tracked value changes, with the open version carried in state
    across micro-batches (the streaming maintenance of scd2_history)."""
    from hummingbird_spark.streaming.stateful import scd2_stream

    src = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run():
        def write(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            scd2_stream(spark.readStream.schema(SCD2_SCHEMA).json(src))
            .writeStream.foreachBatch(write)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()

    # batch 1: user 1 goes X X Y -> version X(2) closes at the Y event
    _write_scd2(src, "0.json",
                [(0, 1, 0, "X"), (1, 1, 1, "X"), (2, 1, 2, "Y")])
    run()
    closed = spark.read.parquet(sink).collect()
    assert len(closed) == 1
    v = closed[0]
    assert (v.state_value, v.n_events) == ("X", 2)
    assert v.valid_from == T0 and v.valid_to == T0 + dt.timedelta(seconds=2)

    # batch 2: user 1 flips back to X -> the OPEN Y version (carried in
    # checkpointed state) closes; user 2 opens its first version
    # (nothing closed for it yet)
    _write_scd2(src, "1.json", [(10, 1, 3, "X"), (11, 2, 4, "A")])
    run()
    closed = sorted(spark.read.parquet(sink).collect(),
                    key=lambda r: r.valid_from)
    assert [(r.state_value, r.n_events) for r in closed] == \
        [("X", 2), ("Y", 1)]
    assert closed[1].valid_to == T0 + dt.timedelta(seconds=10)
    assert all(r.user_id == 1 for r in closed)


def test_scd2_stream_null_safe_versions(spark, tmp_path):
    """NULL state values version NULL-safely: NULL->NULL extends the
    open version, NULL->value and value->NULL close it (the batch
    operator's eqNullSafe contract)."""
    from hummingbird_spark.streaming.stateful import scd2_stream

    src = str(tmp_path / "cdcn")
    ckpt = str(tmp_path / "ckptn")
    sink = str(tmp_path / "sinkn")
    _write_scd2(src, "0.json",
                [(0, 1, 0, None), (1, 1, 1, None), (2, 1, 2, "A"),
                 (3, 1, 3, None)])

    def write(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        scd2_stream(spark.readStream.schema(SCD2_SCHEMA).json(src))
        .writeStream.foreachBatch(write)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    closed = sorted(spark.read.parquet(sink).collect(),
                    key=lambda r: r.valid_from)
    assert [(r.state_value, r.n_events) for r in closed] == \
        [(None, 2), ("A", 1)]


def test_event_time_sessionization(spark, tmp_path):
    """sessionize_stream closes sessions when the WATERMARK (event
    time) passes last_ts + gap: intra-batch gaps split immediately;
    open sessions close on a later run once fresher events advance the
    watermark past their timeout."""
    from hummingbird_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "sev")
    ckpt = str(tmp_path / "sckpt")
    sink = str(tmp_path / "ssink")

    def run():
        def write(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            sessionize_stream(
                spark.readStream.schema(SCHEMA).json(src),
                gap_seconds=60, watermark_delay="0 seconds")
            .writeStream.foreachBatch(write)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()

    # batch 1: user 1 has two sessions separated by a 300 s gap
    # (intra-batch split); the second stays open
    _write(src, "0.json", [(0, 1, 1.0), (10, 1, 2.0),
                           (310, 1, 4.0), (315, 1, 8.0)])
    run()
    import glob as _g
    if _g.glob(os.path.join(sink, "*.parquet")):
        closed = spark.read.parquet(sink).collect()
        assert len(closed) >= 1

    # batch 2: a much later event advances the watermark past the open
    # session's timeout -> it closes on this (or the next) run
    _write(src, "1.json", [(5000, 2, 1.0)])
    run()
    _write(src, "2.json", [(9000, 2, 1.0)])
    run()

    rows = spark.read.parquet(sink).filter("user_id = 1") \
        .orderBy("session_start").collect()
    assert len(rows) == 2
    first, second = rows
    assert first.n_events == 2 and first.total_value == 3.0
    assert (first.session_end - first.session_start).seconds == 10
    assert second.n_events == 2 and second.total_value == 12.0
