"""Scale probe: replicate sf0.1 10x (deterministically) and measure how
the headline plans scale. Writes SCALE.md.

Replication keeps distributions honest:
  - lineitem/orders: keys offset per copy (join fan-out preserved; no
    artificial key collisions);
  - events: user_id offset per copy -> 10x users at the same per-user
    event density (window partition count grows, partition size
    doesn't — the shape that matters for the sessionization/funnel
    family);
  - documents: per-copy character permutation of the text (JVM-side
    translate()) -> shingle/fingerprint statistics preserved, no
    cross-copy duplicate explosion.

Run: python scripts/scale_probe.py [--copies 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hummingbird_spark.plans.queries import QUERIES  # noqa: E402
from hummingbird_spark.session import get_spark  # noqa: E402
from hummingbird_spark.sources.tables import (  # noqa: E402
    DEFAULT_SF_DIR,
    load_table,
)

SRC = DEFAULT_SF_DIR
OUT = "/tmp/hummingbird_scale"

PROBES = [
    # name, tables it reads (for rows/s accounting)
    ("pricing_summary", ["lineitem"]),
    ("revenue_by_nation", ["lineitem", "orders"]),
    ("shipping_priority", ["lineitem", "orders", "customer"]),
    ("priority_linestatus", ["lineitem"]),
    ("funnel_steps", ["events"]),
    ("session_stats", ["events"]),
    ("cohort_retention", ["events"]),
    ("hash_sample", ["documents"]),
    ("minhash_dups", ["documents"]),
    ("winnow_pairs", ["documents"]),
    ("doc_quality", ["documents"]),
    ("top_orders_per_cust", ["orders"]),
    # round-3 additions
    ("first_order_gap", ["orders", "customer"]),
    ("supplier_fill_rate", ["lineitem", "orders"]),
    ("events_sessionized", ["events"]),
    ("minhash_signature_probe", ["documents"]),
    # all-pairs is O(n^2): embeddings replicate 4x (16x pairs), which
    # is the regime that forces the blocked kernel past one block —
    # the property under test; growth is quoted against 16x pair work
    ("embedding_top_pairs", ["embeddings"]),
    ("keep_newest_orders", ["orders"]),
    ("doc_chunks", ["documents"]),
    ("profile_orders", ["orders"]),
    # round-3 continuation
    ("segment_dup_stats", ["documents"]),
    ("classifier_quality_mix", ["documents"]),
    ("mixture_temperature", ["documents"]),
    ("embedding_dup_clusters", ["embeddings"]),
    ("bm25_topk", ["documents"]),
    ("perplexity_outliers", ["documents"]),
    # r5: capped+broadcast headline vs the uncapped exact model
    ("perplexity_outliers_exact", ["documents"]),
    ("hybrid_rrf", ["documents", "embeddings"]),
    # round-4 additions: the effectful pipelines under the same lens
    ("migration_copy_verify", ["lineitem"]),
    ("cdc_apply_verify", ["orders"]),
    # round-4 text-quality family
    ("gopher_rule_stats", ["documents"]),
    ("ngram_repetition_stats", ["documents"]),
    ("boilerplate_stats", ["documents"]),
    # round-4 late additions
    ("quality_funnel", ["documents"]),
    ("exact_substring_stats", ["documents"]),
    # r5: DSIR targeted selection (model fit + score + Gumbel top-k)
    ("dsir_logweights", ["documents"]),
    ("dsir_selection", ["documents"]),
    # the huge-k quantile-cutoff path: the growth curve that matters is
    # that the refinement loop's extra passes stay bounded as n grows
    ("dsir_selection_distributed", ["documents"]),
    # late r5: distributed k-means (embeddings replicate 4x like the
    # pair probes, but k-means is O(n*k*T) — growth should track the
    # 4x row count, not the 16x pair count), KN trigram LM (the
    # type-table joins are the Heaps term), SCD2 (one shuffle+windows)
    ("kmeans_assign", ["embeddings"]),
    ("kn_perplexity", ["documents"]),
    # capped (deployable) variant: broadcast top-K model, pruned tail
    # through the c3=0 backoff — the growth curve that should flatten
    ("kn_perplexity_capped", ["documents"]),
    ("scd2_history", ["events"]),
    # r6: UniMax waterfill (corpus scan + tiny window frame), CMS at
    # trigram grain (sketch build is the Heaps-term aggregation the
    # counter table bounds), trigram novelty (distinct-grain explode +
    # type-grain aggregate + equi-join)
    ("unimax_mixture", ["documents"]),
    ("cms_heavy_hitters", ["documents"]),
    ("doc_novelty", ["documents"]),
    # quantized-GD training: T iterations x 2 scans of the hashed
    # counts frame — growth should track rows, not vocabulary
    ("classifier_scores", ["documents"]),
    ("unimax_curated_sample", ["documents"]),
    # two-pass MG: both passes are corpus-linear scans; the candidate
    # set and recount shuffle are bounded by partitions*k, not vocab
    ("mg_heavy_hitters", ["documents"]),
    ("unimax_packed_pipeline", ["documents"]),
    ("hdr_quantiles", ["documents"]),
    # effectful: runs the whole curate->pack->write chain under proof
    ("curation_pipeline_verify", ["documents"]),
    ("reservoir_sample", ["documents"]),
    ("packed_interleaved", ["documents"]),
    # HLL registers partial-aggregate map-side; sublinear by design
    ("hll_distinct", ["lineitem"]),
    ("source_length_profile", ["documents"]),
    # register-table set algebra: one corpus scan, then |pairs|*m rows
    ("source_vocab_overlap", ["documents"]),
    ("source_heavy_hitters", ["documents"]),
    # r7: link graph (df-capped shingle self-join bounds edge fan-out;
    # T rounds of bounded equi-joins on the node/edge frames — growth
    # should track the edge list, not doc pairs)
    ("link_pagerank", ["documents"]),
    ("link_communities", ["documents"]),
    # late r7: weighted/seeded variants and the LP x PR composition
    ("link_pagerank_weighted", ["documents"]),
    ("trustrank_scores", ["documents"]),
    ("link_canonical_docs", ["documents"]),
    # r8: the three-chain composite (PageRank + classifier + KN
    # perplexity -> UniMax) — growth should track the SUM of its
    # already-probed parts, nothing superlinear on top
    ("curation_composite_weights", ["documents"]),
    # r8 web front end: extraction is a narrow per-row projection
    # (growth should track the corpus scan); warc adds the fixture's
    # file-grain groupBy + record explode; url/domain are one
    # canonicalize projection + one aggregation each
    ("html_main_text_stats", ["documents"]),
    ("warc_html_pipeline", ["documents"]),
    ("url_canonical_dups", ["documents"]),
    ("domain_curation_stats", ["documents"]),
    # anchor-extracted link graph: edge list tracks pages (5 links
    # per page, ring + same-host extras), so PR rounds should grow
    # with the corpus like link_pagerank does with its edge list
    ("page_out_links", ["documents"]),
    ("web_link_pagerank", ["documents"]),
]

EMB_COPIES = 4

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _permuted(alpha: str, i: int) -> str:
    # deterministic rotation-based permutation per copy
    return alpha[i % 26:] + alpha[: i % 26]


def build(spark, copies: int) -> None:
    small = ["region", "nation", "customer", "supplier", "part"]
    for t in small:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet")

    emb = load_table(spark, SRC, "embeddings")
    vid_span = emb.agg(F.max("vec_id")).first()[0] + 1
    u = emb
    for i in range(1, EMB_COPIES):
        u = u.unionByName(emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * vid_span)))
    u.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

    li = load_table(spark, SRC, "lineitem")
    # span must cover BOTH tables' keys or lineitem-less orders would
    # collide across copies (duplicate o_orderkey)
    okey_span = max(
        li.agg(F.max("l_orderkey")).first()[0],
        load_table(spark, SRC, "orders").agg(F.max("o_orderkey")).first()[0],
    ) + 1
    parts = []
    for i in range(copies):
        parts.append(li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * okey_span)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")

    o = load_table(spark, SRC, "orders")
    parts = []
    for i in range(copies):
        parts.append(o.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    e = load_table(spark, SRC, "events")
    uid_span = e.agg(F.max("user_id")).first()[0] + 1
    eid_span = e.agg(F.max("event_id")).first()[0] + 1
    parts = []
    for i in range(copies):
        parts.append(
            e.withColumn("user_id", F.col("user_id") + F.lit(i * uid_span))
            .withColumn("event_id", F.col("event_id") + F.lit(i * eid_span)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    d = load_table(spark, SRC, "documents")
    did_span = d.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(copies):
        parts.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * did_span))
            .withColumn("text", F.translate("text", ALPHA, _permuted(ALPHA, i))))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")


def time_query(spark, name, sf_dir):
    t0 = time.time()
    n = QUERIES[name].spark(spark, sf_dir).count()
    return time.time() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("building", OUT, file=sys.stderr)
    build(spark, args.copies)

    counts = {}
    for t in ["lineitem", "orders", "events", "documents", "customer",
              "embeddings"]:
        counts[t] = (load_table(spark, SRC, t).count(),
                     load_table(spark, OUT, t).count())

    rows_md = []
    for name, tables in PROBES:
        # warm BOTH sides (plan shape + page cache) so the growth
        # column compares like with like — a warm small run against a
        # cold 10x run reads as superlinear even for a linear plan
        time_query(spark, name, SRC)
        time_query(spark, name, OUT)
        s_small, _ = time_query(spark, name, SRC)
        s_big, _ = time_query(spark, name, OUT)
        in_small = sum(counts[t][0] for t in tables)
        in_big = sum(counts[t][1] for t in tables)
        factor = s_big / s_small if s_small > 0 else float("nan")
        rows_md.append(
            f"| {name} | {s_small:.2f} | {s_big:.2f} | {factor:.1f}x "
            f"| {in_big / s_big / 1e6:.2f} |")
        print(rows_md[-1], file=sys.stderr)

    cdc_md = cdc_probe(spark)
    from frontier_probe import probe_md as frontier_md
    from skew_probe_cluster_sample import probe_md as cluster_skew_md
    from skew_probe_graph import probe_md as graph_skew_md
    from skew_probe_kn import probe_md as kn_skew_md
    from skew_probe_reservoir import probe_md as reservoir_skew_md
    from skew_probe_lsh import probe_md as lsh_skew_md
    from skew_probe_substring import probe_md as substring_skew_md
    skew_md = (substring_skew_md(spark) + lsh_skew_md(spark)
               + cluster_skew_md(spark) + kn_skew_md(spark)
               + reservoir_skew_md(spark) + graph_skew_md(spark)
               + frontier_md(spark))

    hdr = (
        "# SCALE — 10x probe (sf0.1 -> ~sf1 replica, local[32])\n\n"
        "Generated by `python scripts/scale_probe.py`. Inputs: "
        + ", ".join(f"{t} {a:,}->{b:,}" for t, (a, b) in counts.items())
        + " rows.\n\n"
        "A plan that holds at scale should grow ~linearly (10x data -> "
        "<=10x time; sublinear when the constant term dominates). "
        "Superlinear growth means a shuffle/partition problem the small "
        "SF was hiding.\n\n"
        "Note: embeddings replicate 4x (not 10x) because "
        "embedding_top_pairs is all-pairs — 4x rows = 16x pair work, "
        "the regime that pushes the blocked kernel past one block "
        "(8,000 rows -> 2 hash blocks -> 3 block-pair tasks); its "
        "growth column is wall-clock vs 16x work, i.e. strongly "
        "sublinear in pairs.\n\n"
        "| query | sf0.1 s | 10x s | growth | 10x Mrows/s |\n"
        "|---|---|---|---|---|\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE.md"), "w") as fh:
        fh.write(hdr + "\n".join(rows_md) + "\n" + cdc_md + skew_md)
    print("wrote SCALE.md", file=sys.stderr)
    return 0


def _toy_oplogs(spark, n_ops: int, n_keys: int):
    from pyspark.sql import functions as F2

    return spark.range(n_ops).select(
        F2.timestamp_seconds(F2.col("id")).alias("ts"),
        F2.col("id").alias("seq"),
        F2.lit("db.t").alias("ns"),
        F2.when(F2.col("id") % 5 == 4, F2.lit("u"))
        .otherwise(F2.lit("i")).alias("op"),
        F2.when(
            F2.col("id") % 5 == 4,
            F2.concat(F2.lit('{"$set": {"v": '),
                      F2.col("id").cast("string"), F2.lit("}}")),
        ).otherwise(
            F2.concat(F2.lit('{"_id": '),
                      (F2.col("id") % n_keys).cast("string"),
                      F2.lit(', "v": '), F2.col("id").cast("string"),
                      F2.lit("}"))
        ).alias("o"),
        F2.when(
            F2.col("id") % 5 == 4,
            F2.concat(F2.lit('{"_id": '),
                      (F2.col("id") % n_keys).cast("string"),
                      F2.lit("}")),
        ).alias("o2"),
    )


def cdc_probe(spark) -> str:
    """Flat vs bucketed CDC merge against a 2M-row target. The flat
    merge rewrites the whole target per batch (O(target)). The bucketed
    sink prunes by pmod(xxhash64(key), N) — so the win scales with how
    few DISTINCT keys a batch carries after the per-key fold: a 20k-
    event batch hammering 50 hot keys folds to 50 rows touching <=50 of
    256 buckets (hot-key update traffic, the steady-state op-log
    shape); a 20k-distinct-key uniform batch touches every bucket (the
    worst case, equivalent to the flat merge's work). Both measured."""
    import shutil
    import time

    from pyspark.sql import functions as F2
    from pyspark.sql import types as T2

    from hummingbird_spark.streaming.cdc import (
        apply_cdc_batch, apply_cdc_batch_bucketed, decode_write_models,
        reduce_write_models,
    )

    schema = T2.StructType([
        T2.StructField("_id", T2.LongType()),
        T2.StructField("v", T2.LongType()),
    ])
    target_rows, buckets = 2_000_000, 256
    rows = []
    for layout in ("flat", "bucketed"):
        base = f"{OUT}/cdc_{layout}"
        shutil.rmtree(base, ignore_errors=True)
        seed = reduce_write_models(decode_write_models(
            _toy_oplogs(spark, target_rows, target_rows)))
        if layout == "flat":
            apply_cdc_batch(spark, seed, base, "_id", schema)
        else:
            apply_cdc_batch_bucketed(spark, seed, base, "_id", schema,
                                     num_buckets=buckets)
        for batch_kind, n_keys in (("uniform-20k-keys", target_rows),
                                   ("hot-50-keys", 50)):
            batch = reduce_write_models(decode_write_models(
                _toy_oplogs(spark, 20_000, n_keys)))
            # merge I/O volume — the term that governs at scale: rows of
            # the target the merge must read+rewrite for this batch
            full_rows = spark.read.parquet(base).count()
            if layout == "flat":
                merged_rows = full_rows
            else:
                from hummingbird_spark.streaming.cdc import _bucket_col
                touched = [r[0] for r in batch
                           .select(_bucket_col(F2.col("key"), buckets)
                                   .alias("b")).distinct().collect()]
                merged_rows = (
                    spark.read.parquet(base)
                    .filter(F2.col("__bucket").isin(touched)).count())
            t0 = time.perf_counter()
            if layout == "flat":
                apply_cdc_batch(spark, batch, base, "_id", schema)
            else:
                apply_cdc_batch_bucketed(spark, batch, base, "_id", schema,
                                         num_buckets=buckets)
            dt = time.perf_counter() - t0
            rows.append(f"| {layout} | {batch_kind} | {dt:.2f} "
                        f"| {merged_rows:,} | {100 * merged_rows // full_rows}% |")
            print(rows[-1], file=sys.stderr)
    return (
        "\n## CDC merge: flat vs bucketed sink, 2M-row target, "
        "20k-event batch\n\n"
        "The bucketed sink prunes the merge to touched hash buckets "
        f"(pmod(xxhash64(key), {buckets})), so a hot-key batch (20k "
        "events folding to 50 distinct keys) reads and rewrites only "
        "~20% of the target; the flat merge always rewrites 100%. "
        "'target rows merged' is the scale-governing term: it is the "
        "I/O volume per batch, and at 100 TB it is the difference "
        "between an unusable O(table) rewrite and an O(touched-"
        "buckets) one. Wall seconds at THIS toy scale favor the flat "
        "merge — a 2M-row target is ~30 MB, so per-bucket task/file "
        "overhead dominates; the crossover comes where bucket size "
        "(table/N) dwarfs task overhead, which is precisely the 100 TB "
        "regime (e.g. 4096 buckets x ~25 GB).\n\n"
        "| sink layout | batch keys | apply s | target rows merged "
        "| % of target |\n|---|---|---|---|---|\n"
        + "\n".join(rows) + "\n"
    )


if __name__ == "__main__":
    sys.exit(main())
