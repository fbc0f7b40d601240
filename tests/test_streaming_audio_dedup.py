"""Streaming audio dedup: volume-scaled copies of ACCEPTED clips drop
on store hits (the aligned-match count IS the verification),
intra-batch copies drop keeping the smaller id, and a wiped-checkpoint
replay is a no-op via the ledger."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.operators.multimodal import synth_wav_dups
from hummingbird_spark.streaming.audio_dedup import (
    start_streaming_audio_dedup,
)

SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
])


def _run(spark, src, out, store):
    q = start_streaming_audio_dedup(spark, src, out, store, SCHEMA)
    assert q.awaitTermination(240)


def _drop_file(df, src, name):
    import glob
    import tempfile

    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, os.path.join(src, name))
    shutil.rmtree(tmp)


def test_streaming_audio_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    os.makedirs(src)

    clips = synth_wav_dups(spark, 24).select("media_id", "data") \
        .localCheckpoint()

    # batch 0: ids 0..15 — every id%4==1 is a volume-scaled copy of
    # id-1, so intra-batch dedup keeps the smaller id
    _drop_file(clips.filter(F.col("media_id") < 16), src, "b0.parquet")
    _run(spark, src, out, store)
    kept0 = {r.media_id for r in spark.read.parquet(out).collect()}
    assert kept0 == set(range(16)) - {1, 5, 9, 13}

    # batch 1: genuinely new clips (16..23, 17/21 intra-batch copies)
    # + re-labeled scaled copies of ACCEPTED clips 1->0 and 5->4
    # (store hits: >= min_matched aligned fingerprints drop them)
    relabeled = clips.filter(F.col("media_id").isin(1, 5)).select(
        (F.col("media_id") + 100).alias("media_id"), "data")
    _drop_file(clips.filter(F.col("media_id") >= 16)
               .unionByName(relabeled), src, "b1.parquet")
    _run(spark, src, out, store)
    kept1 = {r.media_id for r in spark.read.parquet(out).collect()}
    assert kept1 == set(range(24)) - {1, 5, 9, 13, 17, 21}
    n_store = spark.read.parquet(store).count()

    # the store carries one fingerprint per full zc-triple per
    # accepted clip: n_windows - 2 each
    from hummingbird_spark.operators.multimodal import (
        audio_fingerprints,
        wav_window_features,
    )

    expect = (audio_fingerprints(wav_window_features(
        clips.filter(F.col("media_id").isin(sorted(kept1))),
        window_ms=4)).count())
    assert n_store == expect

    # replay: wipe the checkpoint; the ledger alone makes both
    # batches no-ops (out and store unchanged)
    shutil.rmtree(store + "._checkpoint")
    _run(spark, src, out, store)
    assert {r.media_id for r in spark.read.parquet(out).collect()} \
        == kept1
    assert spark.read.parquet(store).count() == n_store
