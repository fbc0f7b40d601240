"""CDX point-lookup probe: k-record fetch cost vs corpus size.

Builds W .warc.gz files x R records each via write_warc_gz (sidecars
included), then times (a) the full-scan read of everything and (b) an
indexed fetch of k=10 specific URLs — at 1x and 10x file counts. The
claim under test: the fetch is O(k) bytes regardless of corpus size,
while the full scan grows linearly.

Usage: python scripts/probe_cdx.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.session import get_spark  # noqa: E402
from hummingbird_spark.sources.warc import (  # noqa: E402
    fetch_warc_records,
    read_warc_gz,
    read_warc_gz_index,
)


def build(spark, out, n_files, recs_per_file):
    from hummingbird_spark.sources.warc import write_warc_gz

    n = n_files * recs_per_file
    df = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string"))
        .alias("canonical_url"),
        F.concat(F.lit("body text for record "),
                 F.col("id").cast("string"), F.lit(" "),
                 F.repeat(F.lit("payload "), 200)).alias("text"),
    ).repartition(n_files)
    write_warc_gz(df, out).collect()
    return n


def main():
    spark = get_spark(app_name="probe_cdx")
    spark.sparkContext.setLogLevel("ERROR")
    k_urls = [f"https://h{i % 97}.example/p/{i}" for i in
              (3, 777, 1500, 2222, 3001, 3555, 4040, 4444, 4747, 4999)]
    print("| files | records | full-scan s | indexed k=10 fetch s |")
    print("|---|---|---|---|")
    for n_files in (20, 200):
        work = tempfile.mkdtemp(prefix="cdx_probe_")
        try:
            n = build(spark, work, n_files, 250)
            t0 = time.perf_counter()
            assert read_warc_gz(spark, work + "/*.warc.gz").count() == n
            full_s = time.perf_counter() - t0
            idx = read_warc_gz_index(spark, work)
            t0 = time.perf_counter()
            got = fetch_warc_records(
                spark,
                idx.filter(F.col("target_uri").isin(*k_urls))).count()
            fetch_s = time.perf_counter() - t0
            assert got == len(k_urls), got
            print(f"| {n_files} | {n} | {full_s:.2f} | {fetch_s:.2f} |")
        finally:
            shutil.rmtree(work, ignore_errors=True)


def main_bigk():
    """Concurrency probe at realistic k (the recrawl-verification
    shape): k=10,000 point lookups across 200 files (50k records).
    fetch_warc_records shuffles selections by file (one task per
    file group, seeks offset-ordered) — the claim: per-task seek
    batching holds at k >> files, staying well under the full-scan
    cost while returning 20% of the corpus."""
    spark = get_spark(app_name="probe_cdx_bigk")
    spark.sparkContext.setLogLevel("ERROR")
    print("| files | records | k | full-scan s | indexed fetch s |")
    print("|---|---|---|---|---|")
    for n_files, recs in ((200, 250),):
        work = tempfile.mkdtemp(prefix="cdx_bigk_")
        try:
            n = build(spark, work, n_files, recs)
            t0 = time.perf_counter()
            assert read_warc_gz(spark, work + "/*.warc.gz").count() == n
            full_s = time.perf_counter() - t0
            idx = read_warc_gz_index(spark, work)
            sel = idx.filter(
                F.regexp_extract("target_uri", r"/p/(\d+)$", 1)
                .cast("long") % 5 == 0)
            k = sel.count()
            t0 = time.perf_counter()
            got = fetch_warc_records(spark, sel).count()
            fetch_s = time.perf_counter() - t0
            assert got == k, (got, k)
            print(f"| {n_files} | {n} | {k} | {full_s:.2f} "
                  f"| {fetch_s:.2f} |")
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if "--bigk" in sys.argv:
        main_bigk()
    else:
        main()
