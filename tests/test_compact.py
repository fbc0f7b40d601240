"""Compaction maintenance pass (operators/compact.py): the small-file
hygiene step for the bucketed CDC sink and any append-heavy target."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hummingbird_spark.operators.compact import (
    compact_table,
    parquet_file_count,
)
from hummingbird_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_compact_flat_table(spark, tmp_path):
    target = str(tmp_path / "t")
    # simulate many tiny appends: 24 single-file writes
    li = load_table(spark, SF_SMOKE, "lineitem").limit(240)
    rows = li.count()
    for i in range(24):
        (li.filter(F.pmod("l_orderkey", F.lit(24)) == i)
         .coalesce(1).write.mode("append").parquet(target))
    assert parquet_file_count(spark, target) >= 20

    report = compact_table(spark, target)
    assert report["files_after"] == 1  # tiny table -> one file
    assert report["rows"] == rows
    assert spark.read.parquet(target).count() == rows


def test_compact_preserves_partition_layout(spark, tmp_path):
    target = str(tmp_path / "p")
    d = (load_table(spark, SF_SMOKE, "orders")
         .withColumn("__bucket", F.pmod(F.xxhash64("o_orderkey"), F.lit(4))))
    # 3 appends x 4 buckets -> >= 12 files
    for _ in range(3):
        (d.repartition(2).write.mode("append")
         .partitionBy("__bucket").parquet(target))
    rows = spark.read.parquet(target).count()
    before = parquet_file_count(spark, target)
    assert before >= 12

    report = compact_table(spark, target, partition_cols=["__bucket"])
    assert report["files_after"] == 4  # one file per bucket dir
    assert report["rows"] == rows
    back = spark.read.parquet(target)
    assert back.count() == rows
    assert sorted(r.__getitem__("__bucket") for r in
                  back.select("__bucket").distinct().collect()) == [0, 1, 2, 3]


def test_compact_failure_leaves_live_table(spark, tmp_path, monkeypatch):
    """A rewrite whose verification fails must raise, delete its temp
    dir, and leave the live table byte-for-byte readable."""
    import hummingbird_spark.operators.compact as mod

    target = str(tmp_path / "f")
    load_table(spark, SF_SMOKE, "nation").write.parquet(target)
    rows = spark.read.parquet(target).count()

    monkeypatch.setattr(mod, "_read_count", lambda s, p: -1)
    with pytest.raises(RuntimeError, match="row-count mismatch"):
        compact_table(spark, target)

    assert spark.read.parquet(target).count() == rows
    import os
    assert not os.path.exists(target + "__compact_tmp")


def test_bucketed_cdc_then_compact_lifecycle(spark, tmp_path):
    """Full maintenance lifecycle: bucketed CDC merge accumulates files
    per bucket across micro-batches; compaction collapses each bucket
    dir to one file WITHOUT changing the converged state, and the
    bucketed merge keeps working against the compacted layout."""
    from hummingbird_spark.streaming.cdc import start_cdc_stream
    from tests.test_migration_lifecycle import SCHEMA, _write_oplog

    tgt = str(tmp_path / "tgt")
    oplog = str(tmp_path / "oplog")
    ckpt = str(tmp_path / "ckpt")

    _write_oplog(oplog, "b1.json",
                 [(i, "i", {"_id": i, "color": "Red", "qty": i}, None)
                  for i in range(40)])
    _write_oplog(oplog, "b2.json",
                 [(100 + i, "u", {"$set": {"qty": 7}}, {"_id": i})
                  for i in range(10)])
    q = start_cdc_stream(spark, oplog, tgt, {"shop.items": SCHEMA},
                         includes=["shop.*"], key="_id", checkpoint=ckpt,
                         num_buckets=4)
    q.awaitTermination(120)

    table = f"{tgt}/items.parquet"
    before = parquet_file_count(spark, table)
    state = sorted(tuple(r) for r in spark.read.parquet(table)
                   .select("_id", "color", "qty").collect())
    assert len(state) == 40

    report = compact_table(spark, table, partition_cols=["__bucket"])
    assert report["files_after"] == 4 <= before
    after = sorted(tuple(r) for r in spark.read.parquet(table)
                   .select("_id", "color", "qty").collect())
    assert after == state

    # stream continues against the compacted layout
    _write_oplog(oplog, "b3.json", [(200, "d", {"_id": 0}, None)])
    q2 = start_cdc_stream(spark, oplog, tgt, {"shop.items": SCHEMA},
                          includes=["shop.*"], key="_id", checkpoint=ckpt,
                          num_buckets=4)
    q2.awaitTermination(120)
    assert spark.read.parquet(table).count() == 39


def test_compact_swap_crash_windows_heal(spark, tmp_path):
    """Chaos over the rename-aside swap: for each crash window (tmp
    written / live renamed aside / tmp renamed in, aside left), the
    debris sweep at the next compact_table call restores a readable,
    content-identical live table."""
    import shutil

    src = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id * 2 AS v") \
        .repartition(8).write.parquet(src)
    want = sorted(tuple(r) for r in spark.read.parquet(src).collect())

    for window in ("tmp", "aside", "in"):
        tmp, aside = src + "__compact_tmp", src + "__compact_aside"
        # a would-be rewrite the crash stranded
        spark.read.parquet(src).repartition(1).write \
            .mode("overwrite").parquet(tmp)
        if window in ("aside", "in"):
            os.rename(src, aside)
        if window == "in":
            os.rename(tmp, src)
        report = compact_table(spark, src)
        assert report["rows"] == 100, window
        got = sorted(tuple(r) for r in spark.read.parquet(src)
                     .select("id", "v").collect())
        assert got == want, window
        assert not os.path.exists(tmp) and not os.path.exists(aside)
        shutil.rmtree(src)
        spark.range(100).selectExpr("id", "id * 2 AS v") \
            .repartition(8).write.parquet(src)
