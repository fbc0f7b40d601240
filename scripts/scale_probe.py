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
from hummingbird_spark.sources.tables import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
]

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _permuted(alpha: str, i: int) -> str:
    # deterministic rotation-based permutation per copy
    return alpha[i % 26:] + alpha[: i % 26]


def build(spark, copies: int) -> None:
    small = ["region", "nation", "customer", "supplier", "part",
             "embeddings"]
    for t in small:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet")

    li = load_table(spark, SRC, "lineitem")
    okey_span = li.agg(F.max("l_orderkey")).first()[0] + 1
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
    for t in ["lineitem", "orders", "events", "documents", "customer"]:
        counts[t] = (load_table(spark, SRC, t).count(),
                     load_table(spark, OUT, t).count())

    rows_md = []
    for name, tables in PROBES:
        # warm the plan shape once at the small SF, then measure both
        time_query(spark, name, SRC)
        s_small, _ = time_query(spark, name, SRC)
        s_big, _ = time_query(spark, name, OUT)
        in_small = sum(counts[t][0] for t in tables)
        in_big = sum(counts[t][1] for t in tables)
        factor = s_big / s_small if s_small > 0 else float("nan")
        rows_md.append(
            f"| {name} | {s_small:.2f} | {s_big:.2f} | {factor:.1f}x "
            f"| {in_big / s_big / 1e6:.2f} |")
        print(rows_md[-1], file=sys.stderr)

    hdr = (
        "# SCALE — 10x probe (sf0.1 -> ~sf1 replica, local[32])\n\n"
        "Generated by `python scripts/scale_probe.py`. Inputs: "
        + ", ".join(f"{t} {a:,}->{b:,}" for t, (a, b) in counts.items())
        + " rows.\n\n"
        "A plan that holds at scale should grow ~linearly (10x data -> "
        "<=10x time; sublinear when the constant term dominates). "
        "Superlinear growth means a shuffle/partition problem the small "
        "SF was hiding.\n\n"
        "| query | sf0.1 s | 10x s | growth | 10x Mrows/s |\n"
        "|---|---|---|---|---|\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE.md"), "w") as fh:
        fh.write(hdr + "\n".join(rows_md) + "\n")
    print("wrote SCALE.md", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
