"""Adversarial-skew A/B probe for the substring first-keeper strategies.

Builds a hot-banner corpus — every doc opens with the same banner
repeated twice, so a handful of window hashes hold ~40% of all
occurrences — and times duplicate_substring_spans end-to-end under
both first_keeper strategies, checking they return identical spans.

What the numbers mean: the window variant does ONE shuffle and is
cheaper whenever the hot partition still fits one task comfortably
(which it does at probe scale); the join variant pays a second
shuffle as insurance — partial aggregation absorbs the hot key
map-side, so no single task ever has to sort the full occurrence list
of a universal banner. At 1e11 occurrences the window variant is a
multi-TB single-task sort (OOM); the join variant degrades linearly.
The probe quantifies the insurance premium, not a win.

Run: python scripts/skew_probe_substring.py [--docs 60000]
Prints a markdown row for SCALE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.operators.dedup import (  # noqa: E402
    duplicate_substring_spans,
)
from hummingbird_spark.session import get_spark  # noqa: E402

L = 20


def build_corpus(spark, n_docs: int):
    banner = " ".join(f"banner{i}" for i in range(L))
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit(banner), F.lit(banner),  # 2x banner: hot windows
                *(F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
                  for j in range(10)),          # unique tail per doc
            ).alias("text"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both variants read equal work
    )


def _ab_row(spark, n_docs: int) -> str:
    df = build_corpus(spark, n_docs)
    df.count()

    results = {}
    for variant in ("window", "join", "window", "join"):  # warm + timed
        t0 = time.perf_counter()
        n = duplicate_substring_spans(
            df, min_len=L, first_keeper=variant).count()
        results[variant] = (time.perf_counter() - t0, n)

    (tw, nw), (tj, nj) = results["window"], results["join"]
    assert nw == nj, f"span counts diverge: window {nw} vs join {nj}"
    return (f"| hot-banner x{n_docs:,} docs | {nj:,} | {tw:.2f} | "
            f"{tj:.2f} | {tj / tw:.1f}x |\n")


def probe_md(spark, n_docs_list=(60_000, 600_000)) -> str:
    """Run the A/B at each corpus size and return the SCALE.md section
    (called by scripts/scale_probe.py so the numbers survive
    regeneration). The second, 10x entry shows the premium's growth as
    the hot hashes fatten — the regime the guard exists for."""
    rows = "".join(_ab_row(spark, n) for n in n_docs_list)
    return (
        "\n## Substring dedup first-keeper: skew insurance premium\n\n"
        "Hot-banner corpus (every doc opens with the same banner "
        "twice; a handful of window hashes hold ~40% of occurrences). "
        "Both strategies return identical spans. The window variant "
        "does ONE shuffle and wins at any scale where the largest "
        "hash's occurrence list still sorts comfortably in one task — "
        "including this probe. The join default pays a second shuffle "
        "so that no single task ever holds a universal banner's full "
        "occurrence list: at ~1e11 occurrences the window variant is "
        "a multi-TB single-task sort (OOM), the join variant degrades "
        "linearly. The premium below is the measured insurance cost, "
        "not a win.\n\n"
        "| corpus | spans | window s | join s | premium |\n"
        "|---|---|---|---|---|\n"
        + rows
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[60_000])
    args = ap.parse_args()

    spark = get_spark(app_name="hb_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(probe_md(spark, args.docs))


if __name__ == "__main__":
    main()
