"""Small-file compaction for parquet targets.

The bucketed CDC sink (streaming/cdc.py::apply_cdc_batch_bucketed)
rewrites only the buckets each micro-batch touches — the right write
amplification, but after thousands of batches every bucket directory
accumulates many small files, and at 100 TB the NameNode/listing and
per-file open costs dominate reads. Compaction is the standard
maintenance pass (Delta OPTIMIZE / Iceberg rewrite_data_files); this is
the plain-parquet equivalent:

  - size the output by BYTES, not file count: target_file_bytes decides
    how many output files the data actually needs,
  - for partitioned layouts, repartition BY the partition columns so
    each partition directory lands in one task -> one file,
  - write to a temp dir, verify row count, then swap via
    RENAME-ASIDE (live -> aside, tmp -> live, drop aside) — a failed
    compaction never corrupts the live table, and a crash inside the
    swap heals at the next compaction (_sweep_compact_debris).

The reference has no analogue (MongoDB storage compacts itself); this
belongs to the Spark-first scale story.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under path (works on HDFS/S3A/local)."""
    fs, hpath = _fs(spark, path)
    return fs.getContentSummary(hpath).getLength()


def parquet_file_count(spark: SparkSession, path: str) -> int:
    return len(spark.read.parquet(path).inputFiles())


def _read_count(spark: SparkSession, path: str) -> int:
    """Seam for the swap-verification count (monkeypatched in tests to
    exercise the failure path without corrupting real files)."""
    return spark.read.parquet(path).count()


def _sweep_compact_debris(spark: SparkSession, path: str) -> None:
    """Heal a crashed compaction swap. Windows: tmp written but never
    promoted (drop it); live renamed aside but tmp not renamed in
    (restore the aside); tmp renamed in, aside not yet removed (drop
    the aside). Aside/tmp are SIBLING paths — never inside a
    partitioned root, where a key=value dir name would be read as a
    partition column."""
    fs, live = _fs(spark, path)
    _, aside = _fs(spark, path.rstrip("/") + "__compact_aside")
    _, tmp = _fs(spark, path.rstrip("/") + "__compact_tmp")
    if fs.exists(aside):
        if fs.exists(live):
            fs.delete(aside, True)
        else:
            fs.rename(aside, live)
    if fs.exists(tmp):
        fs.delete(tmp, True)


def compact_table(spark: SparkSession, path: str,
                  target_file_bytes: int = 128 * 1024 * 1024,
                  partition_cols: list[str] | None = None,
                  merge_schema: bool = False) -> dict:
    """Rewrite a parquet table into ~size/target_file_bytes files.

    partition_cols: hive-style partition columns of the layout (e.g.
    ["__bucket"] for the CDC sink); preserved in the rewritten table,
    one file per partition directory.

    merge_schema: read with parquet schema merging — required when
    the table's files mix schema versions (a column added by a later
    writer), else the rewrite silently drops the new column whenever
    the picked footer predates it.

    Returns a report dict (files/bytes before and after).
    """
    _sweep_compact_debris(spark, path)
    before_files = parquet_file_count(spark, path)
    before_bytes = table_bytes(spark, path)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    n_out = max(1, math.ceil(before_bytes / target_file_bytes))

    tmp = path.rstrip("/") + "__compact_tmp"
    writer = (
        df.repartition(*([n_out] + list(partition_cols)))
        if partition_cols else df.repartition(n_out)
    ).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    # verify before swapping — a bad rewrite must never replace the live
    # table (compare counts, the cheapest full-coverage invariant)
    n_src = df.count()
    n_tmp = _read_count(spark, tmp)
    fs, live = _fs(spark, path)
    _, tmp_p = _fs(spark, tmp)
    if n_tmp != n_src:
        fs.delete(tmp_p, True)
        raise RuntimeError(
            f"compaction row-count mismatch ({n_tmp} != {n_src}); "
            f"live table untouched"
        )
    # rename-aside swap (never delete-then-rename: a crash between
    # the two would lose the live table) — every window heals via
    # _sweep_compact_debris on the next compaction
    _, aside = _fs(spark, path.rstrip("/") + "__compact_aside")
    fs.rename(live, aside)
    fs.rename(tmp_p, live)
    fs.delete(aside, True)
    return {
        "path": path,
        "files_before": before_files,
        "files_after": parquet_file_count(spark, path),
        "bytes_before": before_bytes,
        "bytes_after": table_bytes(spark, path),
        "rows": n_src,
    }
