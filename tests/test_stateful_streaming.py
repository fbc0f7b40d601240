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
