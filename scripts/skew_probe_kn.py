"""Adversarial-skew probe for kn_perplexity_capped's pruned-tail joins
(operators/search.py::kn_trigram_perplexity, model_top_k path).

The capped design claim: "the cap removes precisely the HOT keys from
the pruned joins — a frequent trigram is in the kept set by
definition, so the pruned-tail joins have no skewable TRIGRAM key."
The loophole that claim does not cover is a hot CONTEXT with all-rare
continuations: millions of distinct trigrams `za zb x_i` each occur
once (so every one is pruned), yet they all join ctx2/midv on the same
(za, zb)/(zb) keys. The build side holds ONE row per key, so the skew
is pure probe-side fanout — exactly the shape AQE's skew-join split
handles — but that is a claim to MEASURE, not assume.

The probe builds two corpora of identical size and trigram volume:
  hot:    every doc carries a frequent header (kept by the cap) plus a
          tail of `za zb x{doc}_{j}` triples — ALL tail trigrams are
          singletons sharing one (u, v) context.
  benign: the same volume of singleton tail trigrams, but with unique
          contexts (`p{doc}_{j} q{doc}_{j} r{doc}_{j}`).

and times kn_trigram_perplexity(model_top_k=64) on each at n and 10n
docs. The hot/benign ratio is the hot-context premium; a flat premium
as the hot key grows 10x is the local falsifier for "the pruned joins
survive context skew at 100 TB". Correctness is asserted at the small
scale: capped row count equals the exact path's, and capped
perplexity >= exact for every doc (pruning only moves mass to the
backoff term).

Run: python scripts/skew_probe_kn.py [--docs 20000 200000]
Prints a markdown section for SCALE.md (also called by scale_probe.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.operators.search import (  # noqa: E402
    kn_trigram_perplexity,
)
from hummingbird_spark.session import get_spark  # noqa: E402

TAIL = 16     # rare tail triples per doc
TOP_K = 64    # cap: keeps the frequent header trigrams, prunes every tail


def build_corpus(spark, n_docs: int, hot: bool):
    """Header `aa bb cc dd aa bb cc dd` (8 tokens -> 6 trigram types
    shared by every doc, all inside the top-64 cap) + TAIL triples that
    are singleton trigram types either sharing one (za, zb) context
    (hot) or with per-doc unique contexts (benign)."""
    did = F.col("id").cast("string")
    if hot:
        tail = [
            F.concat(F.lit("za zb x"), did, F.lit(f"_{j}"))
            for j in range(TAIL)
        ]
    else:
        tail = [
            F.concat(F.lit(f"p{j}_"), did, F.lit(f" q{j}_"), did,
                     F.lit(f" r{j}_"), did)
            for j in range(TAIL)
        ]
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.lit("aa bb cc dd aa bb cc dd"), *tail)
            .alias("text"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both variants read equal work
    )


def _assert_capped_vs_exact(spark, n_docs: int = 2_000) -> None:
    df = build_corpus(spark, n_docs, hot=True)
    capped = kn_trigram_perplexity(df, model_top_k=TOP_K) \
        .withColumnRenamed("kn_perplexity", "ppl_c")
    exact = kn_trigram_perplexity(df) \
        .withColumnRenamed("kn_perplexity", "ppl_e")
    j = capped.join(exact, "doc_id").select("ppl_c", "ppl_e")
    bad = j.filter(F.col("ppl_c") < F.col("ppl_e") - 1e-6).count()
    n_c, n_e = capped.count(), exact.count()
    assert n_c == n_e == n_docs, f"row counts diverge: {n_c}/{n_e}/{n_docs}"
    assert bad == 0, f"{bad} docs with capped ppl < exact ppl"


def _timed(spark, n_docs: int, hot: bool) -> float:
    df = build_corpus(spark, n_docs, hot)
    df.count()
    best = float("inf")
    for _ in range(2):  # warm + timed
        t0 = time.perf_counter()
        n = kn_trigram_perplexity(df, model_top_k=TOP_K).count()
        best = min(best, time.perf_counter() - t0)
    assert n == n_docs
    return best


def probe_md(spark, n_docs_list=(20_000, 200_000)) -> str:
    _assert_capped_vs_exact(spark)
    rows = ""
    for n in n_docs_list:
        th = _timed(spark, n, hot=True)
        tb = _timed(spark, n, hot=False)
        rows += (f"| {n:,} docs, {n * TAIL:,} pruned trigrams | "
                 f"{tb:.2f} | {th:.2f} | {th / tb:.1f}x |\n")
    return (
        "\n## KN capped pruned-tail joins: hot-context premium\n\n"
        "Adversarial corpus for kn_perplexity_capped: every doc's "
        "pruned tail shares ONE (u, v) context, so the pruned-side "
        "joins to ctx2/midv probe a single hot key (the case the "
        "'frequent trigrams are kept' argument does not cover). The "
        "build side holds one row per key — pure probe-side fanout, "
        "which AQE skew-splits. The benign twin has identical volume "
        "with unique contexts; the ratio is the hot-context premium, "
        "and a flat premium across a 10x hot-key growth is the local "
        "evidence the pruned joins survive context skew at scale. "
        "Capped-vs-exact correctness asserted first (equal row "
        "counts; capped ppl >= exact for every doc). Writing this "
        "probe caught a real mid-scale bug: Catalyst broadcast all "
        "four type-grain lookup tables whenever their estimates "
        "cleared the 64 MB session threshold, and at 200k docs the "
        "four concurrent near-threshold HashedRelations OOMed the "
        "driver — the joins are now pinned shuffle_hash "
        "(operators/search.py), the only plan that survives every "
        "scale.\n\n"
        "| corpus | benign s | hot-context s | premium |\n"
        "|---|---|---|---|\n"
        + rows
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[20_000])
    args = ap.parse_args()

    spark = get_spark(app_name="hb_skew_probe_kn")
    spark.sparkContext.setLogLevel("ERROR")
    print(probe_md(spark, args.docs))


if __name__ == "__main__":
    main()
