"""Bucketed-table layout: shuffle-free co-located joins (SURVEY §2.11 D3).

The reference replicates a sharded cluster's layout onto the target —
shard key, zone tags, pre-split chunk ranges (config_copier.go:42-342)
— so that data lands pre-partitioned and the balancer never has to move
it. Spark's native equivalent of "pre-placed by key" is the **bucketed
table**: `bucketBy(n, key)` hashes rows into a fixed number of buckets
at WRITE time, and every later join or aggregation on that key reads
the co-located buckets directly — no shuffle, ever, for that key.

At 100 TB this is the difference between re-shuffling the fact table on
every join (the dominant cost of a Spark job) and paying the shuffle
ONCE at ingest:

  - fact ⋈ fact on the bucket key: zero Exchange on either side
    (SortMergeJoin reads matching buckets pairwise),
  - groupBy(bucket key): zero Exchange (partial = final aggregation),
  - repeated queries amortize the one-time bucketed write.

Bucket count guidance: buckets are fixed at write time (like the
reference's chunk pre-splits), so size them for the TARGET scale —
total_bytes / bucket ≈ 128-512 MB. Too few buckets caps parallelism;
too many makes small files. The reference's analogous knob is the
10,000-row block size (neutrino.go:17-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a managed bucketed table (hash(key) % n layout).

    `sort_cols` additionally sorts rows within each bucket file —
    Spark's SortMergeJoin then skips the per-partition sort when every
    bucket holds one file (the post-compaction steady state), and
    min/max row-group stats make key-range scans on the sort column
    prunable. The reference's index copy (index_copier.go:14-62) maps
    here: leading index column -> sortBy column."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.format("parquet").saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key with the SAME bucket
    count: Spark matches bucket i of the left to bucket i of the right
    and neither side shuffles (verified by plan assertion in
    tests/test_bucketing.py — no ShuffleExchange above either scan).

    The merge hint pins SortMergeJoin so the plan shape is stable even
    when one side would fit a broadcast: for a one-off query broadcast
    is fine, but the point of paying the bucketed write is that REPEATED
    joins stay shuffle-free without rebroadcasting per query."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, on, how)
