"""Streaming pHash image dedup: intra-batch near-dups drop, store
hits drop VERIFIED (exact Hamming, not bare band collisions), replay
is a no-op, and chance band collisions alone never drop an image."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.operators.multimodal import synth_images
from hummingbird_spark.streaming.media_dedup import (
    start_streaming_phash_dedup,
)

SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
])


def _run(spark, src, out, store):
    q = start_streaming_phash_dedup(spark, src, out, store, SCHEMA)
    q.awaitTermination(240)


def _drop_file(df, src, name):
    """Materialize a batch as ONE flat parquet file in the stream
    dir (the file source lists files, not nested directories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, os.path.join(src, name))
    shutil.rmtree(tmp)


def test_streaming_phash_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    os.makedirs(src)

    imgs = synth_images(spark, 30).select("media_id", "data") \
        .localCheckpoint()

    # batch 0: ids 0..23 — every id with id%4==1 is a planted perturbed
    # copy of id-1, so intra-batch dedup keeps the smaller id
    _drop_file(imgs.filter(F.col("media_id") < 24), src, "b0.parquet")
    _run(spark, src, out, store)
    kept0 = {r.media_id for r in spark.read.parquet(out).collect()}
    planted0 = {m for m in range(24) if m % 4 == 1}
    assert kept0 == set(range(24)) - planted0

    # batch 1: genuinely new images (24..29, with 25/29 intra-batch
    # copies of 24/28) + re-labeled copies of ACCEPTED images 0 and 4
    # (store hits -> verified drop)
    relabeled = imgs.filter(F.col("media_id").isin(0, 4)).select(
        (F.col("media_id") + 101).alias("media_id"), "data")
    _drop_file(imgs.filter(F.col("media_id") >= 24)
               .select("media_id", "data").unionByName(relabeled),
               src, "b1.parquet")
    _run(spark, src, out, store)
    kept1 = {r.media_id for r in spark.read.parquet(out).collect()}
    assert kept1 == (set(range(30)) - {m for m in range(30)
                                       if m % 4 == 1})
    # store rows: 8 band rows per accepted image
    nstore = spark.read.parquet(store).count()
    assert nstore == 8 * len(kept1)

    # replay: wipe the checkpoint; the ledger alone makes both batches
    # no-ops (out and store unchanged)
    import shutil

    shutil.rmtree(store + "._checkpoint")
    _run(spark, src, out, store)
    assert {r.media_id
            for r in spark.read.parquet(out).collect()} == kept1
    assert spark.read.parquet(store).count() == nstore
