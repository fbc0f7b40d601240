"""Adversarial-skew A/B probe for stratified_reservoir's two-phase
cutoff (operators/dsir.py::stratified_reservoir(method='cutoff')).

Builds a hot-stratum corpus — a configurable fraction of all rows land
in stratum 's0' (one data source dominating the mixture) — and times
the sample under both strategies:

  cutoff (scale path): per-stratum exact weight sums (a strata-row
      aggregate) set the key cutoff c_s = -4k / sum(w); since the
      Efraimidis-Spirakis key satisfies P(key >= c) = 1 - exp(c*w)
      under the derived uniform, ~4k rows survive per stratum and
      only those enter the window sort. Deterministic: the cutoff is
      a pure function of exact aggregates, so the selection stays
      partition-invariant (unlike an approxQuantile cutoff).
  window (default): row_number() OVER (PARTITION BY strata ORDER BY
      key DESC) over ALL rows — the hot stratum is hash-shuffled into
      ONE task and fully sorted before all but k rows are dropped.

Identical sample asserted (exceptAll = 0). At probe scale the naive
hot sort still fits one task; at 100 TB a 90%-hot source is a
multi-TB single-task sort the naive shape cannot survive.

Run: python scripts/skew_probe_reservoir.py [--rows 1000000 10000000]
Prints a markdown section for SCALE.md (also called by scale_probe.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.operators.dsir import (  # noqa: E402
    stratified_reservoir,
)
from hummingbird_spark.session import get_spark  # noqa: E402

N_STRATA = 200
K = 100
HOT_FRAC = 0.9


def build_corpus(spark, n_rows: int):
    """(doc_id, source, w): 90% of rows in stratum s0, the rest
    uniform over s1..s199; weights vary 1..50 so the weighted key
    path is exercised."""
    n_hot = int(n_rows * HOT_FRAC)
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < n_hot, F.lit("s0"))
            .otherwise(F.concat(F.lit("s"),
                                (F.col("id") % (N_STRATA - 1)) + 1))
            .alias("source"),
            (F.col("id") * 13 % 50 + 1).alias("w"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both variants read equal work
    )


def _ab_row(spark, n_rows: int) -> str:
    d = build_corpus(spark, n_rows)
    d.count()

    results = {}
    for variant in ("window", "cutoff", "window", "cutoff"):  # warm+timed
        t0 = time.perf_counter()
        out = stratified_reservoir(d, "source", K, "w",
                                   method=variant)
        n = out.count()
        results[variant] = (time.perf_counter() - t0, n)

    (tw, nw), (tc, nc) = results["window"], results["cutoff"]
    assert nw == nc, f"sample sizes diverge: window {nw} vs cutoff {nc}"
    diff = (
        stratified_reservoir(d, "source", K, "w", method="cutoff")
        .select("doc_id")
        .exceptAll(stratified_reservoir(d, "source", K, "w")
                   .select("doc_id"))
        .count()
    )
    assert diff == 0, f"cutoff sample is not the E-S sample ({diff})"
    n_hot = int(n_rows * HOT_FRAC)
    return (f"| {n_hot:,} hot / {n_rows:,} rows | {nc:,} | {tw:.2f} | "
            f"{tc:.2f} | {tc / tw:.1f}x |\n")


def probe_md(spark, n_rows_list=(1_000_000, 10_000_000, 40_000_000)) -> str:
    rows = "".join(_ab_row(spark, n) for n in n_rows_list)
    return (
        "\n## Stratified reservoir: cutoff vs naive window, "
        f"k={K}, {HOT_FRAC:.0%}-hot stratum\n\n"
        "Adversarial mixture: 90% of all rows from one source. The "
        "naive shape sorts the ENTIRE hot stratum inside one window "
        f"task before dropping all but {K} rows; the cutoff filters "
        f"to ~{4 * K} key survivors per stratum BEFORE the window "
        "(c_s = -4k/sum(w), deterministic from exact aggregates), so "
        "the hot task's sort input is constant in corpus size. "
        "Identical sample asserted (exceptAll = 0).\n\n"
        "| corpus | sampled | window s | cutoff s | cutoff/window |\n"
        "|---|---|---|---|---|\n"
        + rows
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[1_000_000])
    args = ap.parse_args()

    spark = get_spark(app_name="hb_skew_probe_reservoir")
    spark.sparkContext.setLogLevel("ERROR")
    print(probe_md(spark, args.rows))


if __name__ == "__main__":
    main()
