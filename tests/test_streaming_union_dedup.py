"""U1 (union of per-shard streams, oplog_streamer.go:70-83) and
streaming dedup within a watermark — the streaming-side idempotency
tool (ST7 analogue for at-least-once sources)."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("shard", T.StringType()),
])

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _write(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for minutes, eid, shard in rows:
            f.write(json.dumps({
                "ts": (T0 + dt.timedelta(minutes=minutes)).strftime(
                    "%Y-%m-%dT%H:%M:%S.000Z"),
                "event_id": eid, "shard": shard,
            }) + "\n")


def test_union_of_per_shard_streams(spark, tmp_path):
    """One streaming query over N shard streams via unionByName —
    the reference runs one OplogStreamer per replica set feeding one
    target (U1)."""
    shard_a, shard_b = str(tmp_path / "a"), str(tmp_path / "b")
    _write(shard_a, "0.json", [(1, 1, "rs0"), (2, 2, "rs0")])
    _write(shard_b, "0.json", [(1, 10, "rs1"), (3, 11, "rs1")])

    sa = spark.readStream.schema(SCHEMA).json(shard_a)
    sb = spark.readStream.schema(SCHEMA).json(shard_b)
    unioned = sa.unionByName(sb)

    q = (
        unioned.writeStream.format("memory").queryName("shards")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM shards").collect()
    assert len(rows) == 4
    assert {r.shard for r in rows} == {"rs0", "rs1"}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed event_ids inside the
    watermark are emitted once — the dedup tool for at-least-once
    upstream delivery."""
    src = str(tmp_path / "stream")
    _write(src, "0.json", [(1, 100, "rs0"), (2, 101, "rs0"),
                           (2, 100, "rs0")])  # 100 duplicated in-batch

    out = str(tmp_path / "out")
    stream = spark.readStream.schema(SCHEMA).json(src)
    deduped = stream.withWatermark("ts", "1 hour") \
        .dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    first = [r.event_id for r in spark.read.parquet(out).collect()]
    assert sorted(first) == [100, 101]  # in-batch duplicate collapsed

    # replay: the same event_id arrives again in a later file while
    # still inside the watermark -> suppressed by the dedup state
    # carried in the checkpoint
    _write(src, "1.json", [(5, 100, "rs0"), (6, 102, "rs0")])
    q2 = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    emitted = [r.event_id for r in spark.read.parquet(out).collect()]
    assert sorted(emitted) == [100, 101, 102]  # 100 exactly once
