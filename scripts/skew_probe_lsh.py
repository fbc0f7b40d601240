"""Adversarial-skew A/B probe for the LSH bucket guard.

Builds a boilerplate-heavy corpus — a configurable fraction of docs
share IDENTICAL text, so every one of their band keys lands in the
same bucket (bucket size = n_hot, far past max_bucket_size) — and
times lsh_candidate_pairs end-to-end under both guard strategies:

  join (shipped, dedup.py:172-183): bucket sizes via groupBy-count,
      then an equi-join filters oversized buckets. Partial aggregation
      absorbs the hot key map-side; AQE can skew-split the join. No
      single task ever materializes the pathological bucket.
  window (the r3 shape this replaced): COUNT() OVER
      (PARTITION BY band, bkey) then filter. One shuffle, but the hot
      bucket must be SORTED into one task before being dropped — the
      straggler is precisely the bucket the guard exists to drop.

Both return identical candidate pairs (asserted). At probe scale the
window's single hot task still fits in memory, so the numbers measure
the insurance premium (or win) honestly; at 100 TB a boilerplate
bucket holding 1e9 band rows is a single-task sort the window variant
cannot survive.

Run: python scripts/skew_probe_lsh.py [--docs 100000 --hot-frac 0.3]
Prints a markdown section for SCALE.md (also called by scale_probe.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.operators.dedup import (  # noqa: E402
    band_keys,
    lsh_candidate_pairs,
    minhash_signature_df,
)
from hummingbird_spark.session import get_spark  # noqa: E402


def build_corpus(spark, n_docs: int, hot_frac: float):
    """n_docs docs; the first hot_frac share one boilerplate text (all
    16 minhashes identical -> every band bucket holds n_hot docs); the
    next 20% form exact-dup PAIRS (bucket size 2, well under the cap —
    so the post-guard self-join still has real survivors to pair); the
    rest carry unique tails so their buckets stay singleton."""
    boiler = " ".join(f"boiler{i}" for i in range(30))
    n_hot = int(n_docs * hot_frac)
    n_paired = int(n_docs * 0.2)
    pair_id = ((F.col("id") - n_hot) / 2).cast("long")
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < n_hot, F.lit(boiler))
            .when(
                F.col("id") < n_hot + n_paired,
                F.concat_ws(
                    " ",
                    *(F.concat(F.lit(f"p{j}_"), pair_id.cast("string"))
                      for j in range(12)),
                ),
            )
            .otherwise(
                F.concat_ws(
                    " ",
                    *(F.concat(F.lit(f"w{j}_"), F.col("id").cast("string"))
                      for j in range(12)),
                )
            )
            .alias("text"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both variants read equal work
    )


def _window_guard_pairs(sig_df, bands: int, rows_per_band: int,
                        max_bucket_size: int):
    """The replaced r3 guard shape, reproduced inline for the A/B."""
    banded = band_keys(sig_df, "doc_id", bands, rows_per_band) \
        .localCheckpoint(eager=False)
    w = Window.partitionBy("band", "bkey")
    sized = (
        banded.withColumn("__bn", F.count(F.lit(1)).over(w))
        .filter(F.col("__bn") <= max_bucket_size)
        .drop("__bn")
    )
    a = sized.select(F.col("doc_id").alias("a"), "band", "bkey")
    b = sized.select(F.col("doc_id").alias("b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _ab_row(spark, n_docs: int, hot_frac: float) -> str:
    df = build_corpus(spark, n_docs, hot_frac)
    df.count()
    bands, rpb, cap = 4, 4, 1000
    sig = minhash_signature_df(df, num_hashes=bands * rpb) \
        .localCheckpoint()  # shared input: time the guard, not MinHash

    results = {}
    for variant in ("window", "join", "window", "join"):  # warm + timed
        t0 = time.perf_counter()
        if variant == "join":
            n = lsh_candidate_pairs(
                sig, bands=bands, rows_per_band=rpb,
                max_bucket_size=cap).count()
        else:
            n = _window_guard_pairs(sig, bands, rpb, cap).count()
        results[variant] = (time.perf_counter() - t0, n)

    (tw, nw), (tj, nj) = results["window"], results["join"]
    assert nw == nj, f"pair counts diverge: window {nw} vs join {nj}"
    assert nj > 0, "probe corpus produced no surviving candidate pairs"
    n_hot = int(n_docs * hot_frac)
    return (f"| {n_hot:,} hot / {n_docs:,} docs | {nj:,} | {tw:.2f} | "
            f"{tj:.2f} | {tj / tw:.1f}x |\n")


def probe_md(spark, n_docs_list=(100_000, 1_000_000),
             hot_frac: float = 0.3) -> str:
    """Run the A/B at each corpus size and return the SCALE.md section
    (called by scripts/scale_probe.py so the numbers survive
    regeneration). The 10x entry tracks the premium as the hot bucket
    grows 10x past the cap."""
    rows = "".join(_ab_row(spark, n, hot_frac) for n in n_docs_list)
    return (
        "\n## LSH bucket guard: skew insurance premium\n\n"
        f"Boilerplate-heavy corpus ({hot_frac:.0%} of docs share one "
        "text, so each of its 4 band buckets holds that whole slice — "
        "far past the 1000-doc cap; another 20% of docs form exact-dup "
        "pairs that survive the guard, so the post-guard self-join "
        "does real work. Both guards drop the same buckets and return "
        "identical candidate pairs. The join guard (shipped) lets "
        "partial aggregation absorb the hot key map-side; the window "
        "guard must hash-shuffle the full hot bucket into ONE task "
        "and sort it before dropping it — survivable here, a multi-GB "
        "single-task sort at corpus scale.\n\n"
        "| corpus | pairs | window s | join s | join/window |\n"
        "|---|---|---|---|---|\n"
        + rows
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[100_000])
    ap.add_argument("--hot-frac", type=float, default=0.3)
    args = ap.parse_args()

    spark = get_spark(app_name="hb_skew_probe_lsh")
    spark.sparkContext.setLogLevel("ERROR")
    print(probe_md(spark, args.docs, args.hot_frac))


if __name__ == "__main__":
    main()
