"""Adversarial-skew A/B probe for cluster_balanced_sample's two-phase
cutoff (operators/cluster.py::balanced_sample_from_assignment).

Builds a hot-cluster assignment frame — a configurable fraction of all
rows land in cluster 0 (the "dominant topic" regime the sampler exists
to rebalance) — and times the sampling phase under both strategies:

  cutoff (shipped): per-cluster counts (k-row collect) size an
      md5-prefix cutoff targeting ~4x n_per survivors; the cutoff
      FILTER rides the scan, so only ~4*n_per*k rows enter the
      per-cluster window sort. The hot cluster contributes ~4*n_per
      rows to its window partition no matter how large it is.
  window (naive): row_number() OVER (PARTITION BY cluster ORDER BY
      md5(id)) over ALL rows, filter rn <= n_per. The hot cluster is
      hash-shuffled into ONE task and fully sorted before all but
      n_per rows are dropped — the single-task-sort straggler shape.

Both draw the same md5-order sample (asserted id-set equality: the
cutoff keeps a superset of the top-n_per md5 prefixes per cluster, so
the post-filter window selects identical rows). At probe scale the
naive hot sort still fits in one task's memory, so the numbers measure
the premium honestly; at 100 TB a 90%-hot cluster is a multi-TB
single-task sort the naive shape cannot survive.

Run: python scripts/skew_probe_cluster_sample.py [--rows 1000000 10000000]
Prints a markdown section for SCALE.md (also called by scale_probe.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.operators.cluster import (  # noqa: E402
    balanced_sample_from_assignment,
)
from hummingbird_spark.session import get_spark  # noqa: E402

K = 1000          # the verdict's hot-cluster regime: k=1000
N_PER = 100
HOT_FRAC = 0.9


def build_assignment(spark, n_rows: int):
    """(vec_id, cluster, dist2): 90% of rows in cluster 0, the rest
    uniform over clusters 1..K-1 (so every cluster is non-empty and the
    window has K real partitions)."""
    n_hot = int(n_rows * HOT_FRAC)
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise((F.col("id") % (K - 1)) + 1).cast("long")
            .alias("cluster"),
            (F.col("id") * 7 % 1000).alias("dist2"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both variants read equal work
    )


def _naive_sample(a):
    h = F.md5(F.col("vec_id").cast("string"))
    w = Window.partitionBy("cluster").orderBy(h.asc(), F.col("vec_id").asc())
    return (
        a.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= N_PER)
        .select("vec_id", "cluster", "dist2")
    )


def _ab_row(spark, n_rows: int) -> str:
    a = build_assignment(spark, n_rows)
    a.count()

    results = {}
    for variant in ("window", "cutoff", "window", "cutoff"):  # warm + timed
        t0 = time.perf_counter()
        if variant == "cutoff":
            out = balanced_sample_from_assignment(a, K, N_PER, "vec_id")
        else:
            out = _naive_sample(a)
        n = out.count()
        results[variant] = (time.perf_counter() - t0, n)

    (tw, nw), (tc, nc) = results["window"], results["cutoff"]
    assert nw == nc, f"sample sizes diverge: window {nw} vs cutoff {nc}"
    diff = (
        balanced_sample_from_assignment(a, K, N_PER, "vec_id")
        .select("vec_id")
        .exceptAll(_naive_sample(a).select("vec_id"))
        .count()
    )
    assert diff == 0, f"cutoff sample is not the md5-order sample ({diff})"
    n_hot = int(n_rows * HOT_FRAC)
    return (f"| {n_hot:,} hot / {n_rows:,} rows | {nc:,} | {tw:.2f} | "
            f"{tc:.2f} | {tc / tw:.1f}x |\n")


def probe_md(spark, n_rows_list=(1_000_000, 10_000_000, 40_000_000)) -> str:
    rows = "".join(_ab_row(spark, n) for n in n_rows_list)
    return (
        "\n## Cluster-balanced sampling: cutoff vs naive window, "
        f"k={K}, {HOT_FRAC:.0%}-hot cluster\n\n"
        "Adversarial assignment: 90% of all rows in one cluster (the "
        "dominant-topic regime). The naive shape sorts the ENTIRE hot "
        "cluster inside one window task before dropping all but "
        f"{N_PER} rows; the shipped two-phase cutoff filters to "
        f"~{4 * N_PER} md5-prefix survivors per cluster BEFORE the "
        "window, so the hot task's sort input is constant in corpus "
        "size. Identical sample asserted (exceptAll = 0). The last "
        "column is the cutoff's cost relative to the naive window: "
        "above 1 the cutoff's fixed two-job overhead dominates (small "
        "corpora, where BOTH run in seconds); it crosses below 1 once "
        "the hot cluster's single-task sort outweighs that overhead "
        "(~30M hot rows on local[32]) and keeps falling — the naive "
        "sort grows with the hot cluster, the cutoff does not.\n\n"
        "| assignment | sampled | window s | cutoff s | cutoff/window |\n"
        "|---|---|---|---|---|\n"
        + rows
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[1_000_000])
    args = ap.parse_args()

    spark = get_spark(app_name="hb_skew_probe_cluster_sample")
    spark.sparkContext.setLogLevel("ERROR")
    print(probe_md(spark, args.rows))


if __name__ == "__main__":
    main()
