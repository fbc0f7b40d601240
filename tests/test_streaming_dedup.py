"""Streaming content-level near-dup filter (streaming/dedup.py):
online MinHash dedup of a document stream against the persisted
band-key store of previously-accepted docs."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from hummingbird_spark.streaming.dedup import start_streaming_dedup

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "cat watches from the warm windowsill in the afternoon sun "
        "and the birds sing in the garden outside the old house")
FAR = ("completely unrelated content about distributed query engines "
       "partitioning shuffles and columnar storage formats with "
       "vectorized execution and adaptive optimization at scale")


def _write(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run(spark, src, out, store, ckpt):
    q = start_streaming_dedup(
        spark, src, out, store, SCHEMA,
        threshold=0.5, checkpoint=ckpt)
    q.awaitTermination(180)


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Batch 1 accepts base + unrelated; batch 2's near-copy of base
    is dropped via the store while its fresh doc is accepted. The
    store grows by the survivors' band keys only."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _write(src, "0.json", [(1, BASE), (2, FAR)])
    _run(spark, src, out, store, ckpt)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}

    # second batch: a near-copy of doc 1 (store hit) + a new doc
    _write(src, "1.json", [
        (10, BASE + " with a tiny trailing addition"),
        (11, FAR.replace("distributed", "centralized")
             .replace("columnar", "row-oriented")
             + " plus several new trailing words here"),
    ])
    _run(spark, src, out, store, ckpt)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 10 not in got            # near-dup of accepted doc 1
    assert got == {1, 2, 11}


def test_streaming_dedup_intra_batch_first_seen_wins(spark, tmp_path):
    """Two near-identical docs in ONE batch: the smaller id survives
    (exact-Jaccard verified), the later one is dropped."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")

    _write(src, "0.json", [
        (5, BASE),
        (6, BASE + " almost identical"),
        (7, FAR),
    ])
    _run(spark, src, out, store, str(tmp_path / "ckpt"))
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {5, 7}
    # store holds band keys for survivors only: bands * 2 docs
    assert spark.read.parquet(store).count() == 8


def test_streaming_dedup_replay_is_noop(spark, tmp_path):
    """Re-delivering an already-ledgered batch id must not duplicate
    output rows (checkpoint-recovery idempotency)."""
    from hummingbird_spark.streaming.dedup import (
        dedup_batch_against_store,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    _write(src, "0.json", [(1, BASE)])
    _run(spark, src, out, store, str(tmp_path / "ckpt"))
    n1 = spark.read.parquet(out).count()

    # fresh checkpoint (simulates offset loss) but same ledger: the
    # replayed batch 0 is skipped
    _run(spark, src, out, store, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(out).count() == n1

    # the pure-plan API also drops a store-known doc directly
    batch = spark.createDataFrame([(99, BASE)], SCHEMA)
    surv, bands = dedup_batch_against_store(
        spark, batch, store, threshold=0.5)
    assert surv.count() == 0 and bands.count() == 0


def test_streaming_dedup_pre_filter(spark, tmp_path):
    """pre_filter runs before dedup: filtered docs never reach the
    output OR the band store."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    _write(src, "0.json", [(1, BASE), (2, "tiny"), (3, FAR)])
    q = start_streaming_dedup(
        spark, src, out, store, SCHEMA, threshold=0.5,
        checkpoint=str(tmp_path / "ckpt"),
        pre_filter=lambda df: df.filter(F.length("text") > 50))
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}
    # 2 docs x 4 bands; the filtered doc contributed nothing
    assert spark.read.parquet(store).count() == 8


def test_streaming_dedup_store_compaction(spark, tmp_path):
    """compact_every=1: after each batch the band store is rewritten
    into a handful of right-sized files while its content (and the
    dedup behavior that reads it) is unchanged."""
    import glob

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")

    _write(src, "0.json", [(1, BASE), (2, FAR)])
    q = start_streaming_dedup(
        spark, src, out, store, SCHEMA, threshold=0.5,
        checkpoint=str(tmp_path / "ckpt"), compact_every=1)
    q.awaitTermination(180)
    n_files_1 = len(glob.glob(f"{store}/*.parquet"))
    assert n_files_1 <= 2
    assert spark.read.parquet(store).count() == 8   # 2 docs x 4 bands

    _write(src, "1.json", [(10, BASE + " near copy addition")])
    q = start_streaming_dedup(
        spark, src, out, store, SCHEMA, threshold=0.5,
        checkpoint=str(tmp_path / "ckpt"), compact_every=1)
    q.awaitTermination(180)
    # the near-dup was dropped via the compacted store
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}
    assert spark.read.parquet(store).count() == 8
    assert len(glob.glob(f"{store}/*.parquet")) <= 2
