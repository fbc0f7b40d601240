"""The composed always-on pipeline a real deployment runs: ONE event
stream fanned out to three independent streaming consumers — SCD2
dimension maintenance (`scd2_stream`), the continuous windowed rollup
(`start_continuous_rollup`), and the online near-dup curation filter
(`start_streaming_dedup`) — each with its own checkpoint and sink.
Across two ingest cycles every sink is asserted to CONVERGE with its
batch twin computed from scratch over everything ingested so far, and
a third no-new-data cycle is asserted to be a no-op for all three
(the replay-idempotency contract under one shared source).

This is the one composition shape the per-operator suites don't cover:
the three consumers share a source directory but keep independent
checkpoints, so their micro-batch boundaries and progress are
unsynchronized — convergence must hold regardless."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.operators.dedup import minhash_near_duplicates
from hummingbird_spark.operators.scd import scd2_history
from hummingbird_spark.streaming.dedup import start_streaming_dedup
from hummingbird_spark.streaming.rollup import (
    read_rollup,
    start_continuous_rollup,
    window_rollup_partials,
)
from hummingbird_spark.streaming.stateful import scd2_stream

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("state_value", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)

DOC_A = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from the warm windowsill in the afternoon sun and "
         "the birds sing in the garden outside the old house")
DOC_B = ("completely unrelated content about distributed query engines "
         "partitioning shuffles and columnar storage formats with "
         "vectorized execution and adaptive optimization at scale")
DOC_C = ("a third entirely different document describing mountain "
         "weather patterns seasonal snowfall accumulation and the "
         "slow migration of glacial ice across alpine valleys")

# (minutes, event_id, user_id, state_value, event_type, value,
#  doc_id, text) — ts increases across cycles (the arrival-order
# contract scd2_stream documents)
CYCLE1 = [
    (0, 1, 1, "X", "click", 1.0, 101, DOC_A),
    (5, 2, 1, "X", "click", 3.0, 102, DOC_B),
    (20, 3, 1, "Y", "view", 10.0, 103, DOC_C),
    (40, 4, 2, "A", "click", 5.0, 104, DOC_A + " tiny trailing change"),
]
CYCLE2 = [
    (70, 5, 1, "X", "view", 2.0, 105,
     DOC_B + " with a tiny trailing addition"),
    (75, 6, 2, "A", "click", 7.0, 106,
     "fresh content about tidal estuaries brackish water ecosystems "
     "and the seasonal return of migratory shorebirds to the flats"),
    (130, 7, 2, "B", "click", 4.0, 107, DOC_C + " with one more clause"),
]


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as fh:
        for minutes, eid, uid, sv, et, v, did, text in rows:
            fh.write(json.dumps({
                "ts": (T0 + dt.timedelta(minutes=minutes)).strftime(
                    "%Y-%m-%dT%H:%M:%S.000Z"),
                "event_id": eid, "user_id": uid, "state_value": sv,
                "event_type": et, "value": v, "doc_id": did,
                "text": text,
            }) + "\n")


def _run_all(spark, src, paths):
    """One availableNow cycle of each consumer, independent checkpoints."""
    def scd2_sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(paths["scd2_out"])

    q = (
        scd2_stream(
            spark.readStream.schema(SCHEMA).json(src)
            .select("user_id", "event_id", "ts", "state_value"))
        .writeStream.foreachBatch(scd2_sink)
        .outputMode("append")
        .option("checkpointLocation", paths["scd2_ckpt"])
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    q.stop()

    q = start_continuous_rollup(
        spark, src, paths["rollup"], SCHEMA,
        checkpoint=paths["rollup_ckpt"])
    q.awaitTermination(180)

    q = start_streaming_dedup(
        spark, src, paths["dedup_out"], paths["dedup_store"], SCHEMA,
        threshold=0.5, checkpoint=paths["dedup_ckpt"])
    q.awaitTermination(180)


def _batch_df(spark, src):
    return spark.read.schema(SCHEMA).json(src)


def _scd2_closed(spark, paths):
    if not os.path.isdir(paths["scd2_out"]):
        return set()
    return {
        (r.user_id, r.state_value, r.valid_from, r.valid_to, r.n_events)
        for r in spark.read.parquet(paths["scd2_out"]).collect()
    }


def _scd2_twin_closed(spark, src):
    hist = scd2_history(
        _batch_df(spark, src)
        .select("user_id", "ts", "event_id", "state_value"),
        ["user_id"], "ts", ["state_value"], order_cols=["event_id"])
    return {
        (r.user_id, r.state_value, r.valid_from, r.valid_to, r.n_events)
        for r in hist.filter(~F.col("is_current")).collect()
    }


def _rollup_state(spark, paths):
    return {
        (r.window_start, r.key): (r.n_events, r.sum_value,
                                  r.min_value, r.max_value)
        for r in read_rollup(spark, paths["rollup"]).collect()
    }


def _rollup_twin(spark, src):
    return {
        (r.window_start, r.key): (r.n_events, r.sum_value,
                                  r.min_value, r.max_value)
        for r in window_rollup_partials(
            _batch_df(spark, src).select("ts", "event_type", "value")
        ).collect()
    }


def _dedup_survivors(spark, paths):
    return {r.doc_id
            for r in spark.read.parquet(paths["dedup_out"]).collect()}


def _dedup_twin(spark, src):
    """Batch twin: MinHash near-dup pairs at the same parameters;
    survivors = every doc minus the larger id of each verified pair.
    The fixture's duplicate relations are isolated pairs with the copy
    arriving later, so greedy first-seen-wins (streaming) and
    drop-the-larger-id (batch) select identical survivors."""
    docs = _batch_df(spark, src).select("doc_id", "text")
    pairs = minhash_near_duplicates(docs, threshold=0.5)
    dropped = {r.b for r in pairs.collect()}
    return {r.doc_id for r in docs.collect()} - dropped


def test_composed_pipeline_converges_with_batch_twins(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    paths = {
        "scd2_out": str(tmp_path / "scd2_out"),
        "scd2_ckpt": str(tmp_path / "scd2_ckpt"),
        "rollup": str(tmp_path / "rollup.parquet"),
        "rollup_ckpt": str(tmp_path / "rollup_ckpt"),
        "dedup_out": str(tmp_path / "dedup_out"),
        "dedup_store": str(tmp_path / "dedup_store"),
        "dedup_ckpt": str(tmp_path / "dedup_ckpt"),
    }

    # cycle 1
    _write(src, "0.json", CYCLE1)
    _run_all(spark, src, paths)
    assert _scd2_closed(spark, paths) == _scd2_twin_closed(spark, src)
    assert _rollup_state(spark, paths) == _rollup_twin(spark, src)
    assert _dedup_survivors(spark, paths) == _dedup_twin(spark, src)
    # the fixture's intent, spelled out: 104 is a near-copy of 101
    assert _dedup_survivors(spark, paths) == {101, 102, 103}

    # cycle 2: user 1 flips back to X (closes the open Y version held
    # in checkpointed state), user 2 versions A -> B; one near-copy of
    # an accepted doc per earlier cycle ingested alongside fresh docs
    _write(src, "1.json", CYCLE2)
    _run_all(spark, src, paths)
    assert _scd2_closed(spark, paths) == _scd2_twin_closed(spark, src)
    assert _rollup_state(spark, paths) == _rollup_twin(spark, src)
    assert _dedup_survivors(spark, paths) == _dedup_twin(spark, src)
    assert _dedup_survivors(spark, paths) == {101, 102, 103, 106}

    # the closed-version set is exactly the batch history minus the
    # two still-open versions (one per user)
    hist_rows = scd2_history(
        _batch_df(spark, src)
        .select("user_id", "ts", "event_id", "state_value"),
        ["user_id"], "ts", ["state_value"], order_cols=["event_id"]
    ).collect()
    assert len(hist_rows) - len(_scd2_closed(spark, paths)) == 2

    # cycle 3: no new data — every sink must be byte-stable
    before = (_scd2_closed(spark, paths), _rollup_state(spark, paths),
              _dedup_survivors(spark, paths))
    _run_all(spark, src, paths)
    after = (_scd2_closed(spark, paths), _rollup_state(spark, paths),
             _dedup_survivors(spark, paths))
    assert before == after
