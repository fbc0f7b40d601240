"""Versioned web-graph probe: update-tick cost vs store size.

Builds a graph store of N pages (in batches), then times one UPDATE
batch (200 pages rewiring their links) at 1x and 10x N. The claim:
the tick is bounded by the batch's keys (equi-joins + max-seq
semi-joins on batch srcs/curls), not the store — near-flat growth.

Usage: python scripts/probe_web_graph_versioned.py
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
from hummingbird_spark.streaming.web_graph_versioned import (  # noqa: E402
    read_web_edges_versioned,
    web_graph_versioned_batch,
)

HOST = "https://probe.example"


def _pages(spark, lo, hi, salt):
    d = F.col("id")
    link = lambda t: F.concat(  # noqa: E731
        F.lit(f'<a href="{HOST}/p/'), t.cast("string"), F.lit('">l</a>'))
    html = F.concat(
        F.lit("<html><body><p>body text</p>"),
        link((d + 1 + salt) % hi), link((3 * d + 7 + salt) % hi),
        F.lit("</body></html>"))
    return spark.range(lo, hi).select(
        d.alias("doc_id"),
        F.concat(F.lit(f"{HOST}/p/"), d.cast("string")).alias("base"),
        html.alias("html"))


def main():
    spark = get_spark(app_name="probe_wgv")
    spark.sparkContext.setLogLevel("ERROR")
    print("| store pages | update batch | tick s |")
    print("|---|---|---|")
    for n in (20_000, 200_000):
        work = tempfile.mkdtemp(prefix="wgv_probe_")
        paths = tuple(os.path.join(work, x)
                      for x in ("lk", "vs", "pg", "ed"))
        try:
            # build the store in 4 ingest batches
            step = n // 4
            for b in range(4):
                web_graph_versioned_batch(
                    spark, _pages(spark, b * step, n, 0)
                    .filter((F.col("doc_id") >= b * step)
                            & (F.col("doc_id") < (b + 1) * step)),
                    *paths, batch_id=b)
            # the timed UPDATE tick: 200 pages rewire their links
            upd = _pages(spark, 0, n, salt=11).filter(
                F.col("doc_id") < 200).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            web_graph_versioned_batch(spark, upd, *paths, batch_id=9)
            tick = time.perf_counter() - t0
            n_edges = read_web_edges_versioned(spark, paths[3]).count()
            assert n_edges > n  # sanity: a real graph came out
            print(f"| {n} | 200 | {tick:.2f} |")
        finally:
            shutil.rmtree(work, ignore_errors=True)


def main_gc():
    """Logical-GC probe: the same 500 pages recrawl U times, so
    superseded ops / old version rows accumulate ~U-fold. Without GC
    the max-seq-wins read and the prev-version lookup scan all
    history; with the watermark-gated GC the store stays ~flat.
    Times the LAST update tick + a maintained-edges read, and counts
    store rows, for U=3 vs U=12 recrawl waves, with gc off/on."""
    from hummingbird_spark.streaming.web_graph_versioned import (
        gc_web_graph_versioned,
    )

    spark = get_spark(app_name="probe_wgv_gc")
    spark.sparkContext.setLogLevel("ERROR")
    n = 20_000
    print("| recrawl waves | gc | last tick s | read s | op rows "
          "| link rows |")
    print("|---|---|---|---|---|---|")
    for waves in (3, 12):
        for gc in (False, True):
            work = tempfile.mkdtemp(prefix="wgv_gc_probe_")
            paths = tuple(os.path.join(work, x)
                          for x in ("lk", "vs", "pg", "ed"))
            try:
                step = n // 4
                for b in range(4):
                    web_graph_versioned_batch(
                        spark, _pages(spark, b * step, n, 0)
                        .filter((F.col("doc_id") >= b * step)
                                & (F.col("doc_id") < (b + 1) * step)),
                        *paths, batch_id=b, gc_every=0)
                last = 0.0
                for u in range(waves):
                    upd = _pages(spark, 0, n, salt=u + 11).filter(
                        F.col("doc_id") < 500) \
                        .localCheckpoint(eager=True)
                    t0 = time.perf_counter()
                    web_graph_versioned_batch(
                        spark, upd, *paths, batch_id=4 + u,
                        gc_every=0)
                    if gc:
                        gc_web_graph_versioned(
                            spark, *paths, watermark=4 + u)
                    last = time.perf_counter() - t0
                t0 = time.perf_counter()
                n_edges = read_web_edges_versioned(
                    spark, paths[3]).count()
                read_s = time.perf_counter() - t0
                assert n_edges > n
                ops = spark.read.parquet(paths[3]).count()
                links = spark.read.parquet(paths[0]).count()
                print(f"| {waves} | {'on' if gc else 'off'} "
                      f"| {last:.2f} | {read_s:.2f} | {ops} "
                      f"| {links} |")
            finally:
                shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if "--gc" in sys.argv:
        main_gc()
    else:
        main()
