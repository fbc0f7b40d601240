"""ST10 in streaming mode: windowed aggregation over a file-source
stream with a watermark — late events inside the watermark update their
window; the update-mode sink shows per-batch window revisions."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])

T0 = dt.datetime(2024, 6, 1, 10, 0, 0)


def _write(path, name, rows):
    with open(os.path.join(path, name), "w") as f:
        for minutes, uid, val in rows:
            f.write(json.dumps({
                "ts": (T0 + dt.timedelta(minutes=minutes)).strftime(
                    "%Y-%m-%dT%H:%M:%S.000Z"),
                "user_id": uid, "value": val,
            }) + "\n")


def test_streaming_tumbling_window_with_watermark(spark, tmp_path):
    src = str(tmp_path / "stream")
    os.makedirs(src)
    _write(src, "00.json", [
        (1, 1, 10.0), (5, 1, 20.0),    # window 10:00
        (12, 2, 5.0),                  # window 10:10
    ])

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("total"))
        .select(F.col("win.start").alias("start"), "n", "total")
    )
    q = (
        agg.writeStream.format("memory").queryName("winagg")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    state = {r.start: (r.n, r.total)
             for r in spark.sql("SELECT * FROM winagg").collect()}
    assert state[T0] == (2, 30.0)
    assert state[T0 + dt.timedelta(minutes=10)] == (1, 5.0)

    # late event (minute 3, inside the 30-min watermark) arrives later:
    # its window must be revised upward on the next trigger
    _write(src, "01.json", [(3, 3, 7.0), (22, 2, 1.0)])
    q2 = (
        agg.writeStream.format("memory").queryName("winagg2")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    updates = {r.start: (r.n, r.total)
               for r in spark.sql("SELECT * FROM winagg2").collect()}
    # the revised 10:00 window now counts the late event too
    assert updates[T0] == (3, 37.0)
    assert updates[T0 + dt.timedelta(minutes=20)] == (1, 1.0)
