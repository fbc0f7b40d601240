"""SparkSession factory tuned for the engine.

The reference hand-tunes its parallelism (8-16 workers, 10k-row blocks,
64 MB batches — neutrino.go:17-22, task.go:23-27). On Spark those knobs
become session conf: shuffle partitions, AQE, broadcast threshold,
file-split sizing. Everything here is scale-oriented: the same conf works
on local[32] and on a 1000-executor cluster (only master/memory change).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the test harness (local[32], 128 GiB). On a real
# cluster, shuffle partitions should be ~2-3x total cores; AQE coalesces
# down at runtime so a generous static value is safe.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "hummingbird_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching replace the reference's hand-coded
      straggler reset (workspace.go:259-273) and batch sizing.
    - Arrow on: any Pandas-UDF path moves data in columnar batches.
    - UTC session timezone: deterministic timestamp semantics vs oracles.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 128 MB file splits: same order as the reference's 64 MB insert
        # batches (task.go:24), sized so a partition fits executor memory.
        # Both split knobs are env-overridable so the oracle sweep can be
        # re-run under adversarial partitioning (tiny input splits, tiny
        # Arrow batches) to prove results are partition- and
        # batch-boundary-invariant — the local stand-in for "would this
        # kernel produce the same answer on 1000 executors".
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                               str(128 * 1024 * 1024)))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # The events fixture is written with nanosecond timestamps, which
        # Spark's parquet reader rejects by default; read them as longs and
        # convert exactly (integer division) in sources.tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # bucketed-table storage for shuffle-free co-located joins
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR",
                               "/tmp/hummingbird_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
