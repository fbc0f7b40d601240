"""Streaming near-dup filter: continuous-ingestion dedup against a
persisted MinHash band store.

Batch dedup (operators/dedup.py) answers "which docs in THIS corpus
duplicate each other"; a training-data ingestion pipeline needs the
online form — "is this NEW document a duplicate of anything we already
accepted" — without rescanning the accepted corpus per batch. The
classic answer (Dolma/CCNet-style) is to keep only the accepted docs'
LSH band keys and test newcomers against that store:

  micro-batch -> MinHash signatures -> band keys
    -> semi-join vs store          (near-dup of accepted? drop)
    -> intra-batch LSH + exact Jaccard verify (first-seen id wins)
    -> survivors append to out_path; their band keys append to store

The store holds (band, bkey) pairs only — k longs per doc, not text —
so at 100 TB of accepted docs it is ~1e-4 of corpus bytes, a normal
parquet table partitionable by band. Store lookups are equi-joins on
(band, bkey); survivors append (no rewrite). A store hit is a
CANDIDATE in MinHash terms, but dropping un-verified hits is the
standard online trade (verification would need the accepted text);
the band count / threshold choice controls the false-drop rate
exactly as in the batch pipeline.

Exactly-once: the out/store appends are guarded by a batch-id ledger
(same discipline as streaming/rollup.py merge_rollup_batch) so a
checkpoint-recovery replay of the last batch is a no-op.

Reference tie-in: the reference dedups on _id at the sink (dup-key
tolerant inserts, task.go:88-101); this operator is the content-level
generalization the LLM-pipeline surface needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hummingbird_spark.operators.dedup import (
    band_keys,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature_df,
)
from hummingbird_spark.streaming.ledger import BatchLedger


def dedup_batch_against_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """One dedup round: returns (survivors, survivor_band_keys).

    Pure plan construction — no writes, no driver data. The store
    semi-join drops any doc sharing a full band with an accepted doc;
    intra-batch near-dups (exact-Jaccard-verified) keep the smallest
    id. Docs emitting no shingles (shorter than one n-gram) have no
    bands and pass through — dedup them by exact fingerprint upstream
    if needed.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signature_df(batch_df, text_col, id_col,
                                num_hashes, ngram)
    batch_bands = band_keys(sigs, id_col, bands, rows_per_band)

    if os.path.exists(os.path.join(store_path, "_SUCCESS")):
        store = spark.read.parquet(store_path).select("band", "bkey")
        hit_ids = (
            batch_bands.join(store, ["band", "bkey"], "left_semi")
            .select(id_col).distinct()
        )
        fresh = batch_df.join(hit_ids, id_col, "left_anti")
        fresh_bands = batch_bands.join(hit_ids, id_col, "left_anti")
        fresh_sigs = sigs.join(hit_ids, id_col, "left_anti")
    else:
        fresh, fresh_bands, fresh_sigs = batch_df, batch_bands, sigs

    # intra-batch: candidates from band collisions, exact verify,
    # first-seen (min id) survives
    cands = lsh_candidate_pairs(fresh_sigs, id_col, bands, rows_per_band)
    dups = (
        jaccard_pairs(fresh, cands, text_col, id_col, ngram)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("b").alias(id_col))  # a < b: later id drops
        .distinct()
    )
    survivors = fresh.join(dups, id_col, "left_anti")
    survivor_bands = fresh_bands.join(dups, id_col, "left_anti")
    return survivors, survivor_bands


def start_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    store_path: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    checkpoint: str | None = None,
    pre_filter=None,
    compact_every: int = 32,
) -> StreamingQuery:
    """File-source JSON stream -> per-batch dedup -> survivors append
    to out_path, their band keys to store_path. Idempotent on batch
    replay via a ledger next to the store.

    pre_filter: optional DataFrame -> DataFrame transform applied to
    each batch BEFORE dedup (quality/language cuts — docs it drops
    never enter the store, so the stream is a full online curation
    path: filter -> near-dedup -> append).

    compact_every: every N applied batches the band store is rewritten
    through the verified compaction swap (operators/compact.py) —
    per-batch appends otherwise compound one small file per batch per
    task, and the store is re-READ every batch (the classic streaming
    small-file failure: scan cost grows with batch COUNT, not data).
    """
    led = BatchLedger(store_path)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if led.seen(batch_id):
            return
        if pre_filter is not None:
            batch_df = pre_filter(batch_df)
        survivors, bands_df = dedup_batch_against_store(
            spark, batch_df, store_path, text_col, id_col,
            threshold, num_hashes, bands, ngram)
        # the bands plan reads the store (left_semi) — materialize both
        # BEFORE appending to the store it reads from
        survivors = survivors.localCheckpoint(eager=True)
        bands_df = bands_df.localCheckpoint(eager=True)
        # order matters on crash-replay: out first, then store, then
        # ledger. A crash inside the window re-appends (duplicates)
        # out rows on replay; the reverse order would instead DROP the
        # batch (its own bands would read as accepted) — duplication
        # is the recoverable failure, loss is not (the shared
        # crash-window contract, streaming/ledger.py).
        survivors.write.mode("append").parquet(out_path)
        bands_df.select("band", "bkey").write.mode("append") \
            .parquet(store_path)
        led.record(batch_id)
        # batch_id guard: a None-batch caller never grows the ledger,
        # and 0 % N == 0 would compact on every call
        if (compact_every and batch_id is not None
                and len(led.applied()) % compact_every == 0):
            from hummingbird_spark.operators.compact import compact_table

            compact_table(spark, store_path)

    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation",
                checkpoint or store_path + "._checkpoint")
        .trigger(availableNow=True)
        .start()
    )
