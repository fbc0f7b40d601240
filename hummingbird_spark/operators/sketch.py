"""Count-min sketch over a token stream (Cormode & Muthukrishnan,
J. Algorithms 2005) — the mergeable frequency sketch a 100 TB pipeline
uses where an exact token-count table would itself be a Heaps-sized
shuffle: approximate counts with a ONE-SIDED error (est >= true;
overshoot <= e/width * total_tokens with prob 1 - (1/2)^depth when
width/depth follow the paper), in depth x width counters regardless of
vocabulary size.

Scale shape: tokens aggregate to TOKEN grain first (map-side partial
aggregation — the explode never crosses the wire), then each distinct
token emits `depth` (row, bucket, cnt) triples and a second groupBy
collapses them to <= depth*width counter rows per partition before the
(tiny) shuffle — the treeAggregate shape expressed declaratively, so
Catalyst fuses it into the scan. The finished sketch is depth*width
rows (a few MB at any corpus size) and BROADCASTS to probes; estimate
lookups are map-side hash joins with no skewable key (every probe hits
exactly depth counter rows).

Determinism / oracle parity: bucket = 60-bit md5 prefix of
"<row>:<token>" mod width — the conv(substring(md5,1,15)) idiom every
hash in this repo pins for exact DuckDB replicability; counters are
integer sums, so sketch AND estimates are bit-identical across
engines, partitionings, and batch sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, row: int, width: int):
    """60-bit md5 prefix of '<row>:<token>' mod width (DuckDB:
    ('0x' || substr(md5(...), 1, 15))::BIGINT % width)."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 15), 16, 10)
        .cast("long") % width
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 gram: str = "token") -> DataFrame:
    """(tok, cnt) at vocabulary grain — the shared input of the sketch
    build and the exact-count probe. gram='trigram' counts adjacent
    word triples instead of unigrams (the n-gram frequency grain where
    the type table is the Heaps term a sketch exists to avoid)."""
    from hummingbird_spark.functions.text import doc_trigrams, tokens

    if gram == "trigram":
        exploded = df.select(
            F.explode(doc_trigrams(F.col(text_col))).alias("tok"))
    else:
        exploded = (
            df.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .select(F.lower(F.col("w")).alias("tok"))
        )
    return exploded.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))


def cms_build(tok_counts: DataFrame, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """(row, bucket, cnt): the depth x width counter table. Missing
    (row, bucket) pairs are implicit zeros — estimates must coalesce,
    which only matters for tokens absent from the corpus."""
    rows = tok_counts.select(
        "cnt",
        F.posexplode(F.array(*[
            _bucket(F.col("tok"), i, width) for i in range(depth)
        ])).alias("row", "bucket"),
    )
    return rows.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, depth: int,
                 width: int, tok_col: str = "tok") -> DataFrame:
    """probes(tok, ...) -> + cms_est: min over the depth counter rows
    each probe hashes to. The sketch side broadcasts (depth*width rows
    by construction)."""
    hashed = probes.select(
        tok_col,
        F.posexplode(F.array(*[
            _bucket(F.col(tok_col), i, width) for i in range(depth)
        ])).alias("row", "bucket"),
    )
    return (
        hashed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(tok_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(df: DataFrame, text_col: str = "text",
                      top_k: int = 20, depth: int = 4,
                      width: int = 1024,
                      gram: str = "token") -> DataFrame:
    """The classic sketch demo, self-verifying: build the sketch, probe
    it with the corpus's true top-k grams, and return (tok, cnt,
    cms_est, overshoot) — overshoot = est - true is the sketch's
    collision error, >= 0 for every row BY CONSTRUCTION (the one-sided
    guarantee; a negative value would be a bug, and the oracle's exact
    replica would catch it). Ties in the true top-k break by token."""
    tc = token_counts(df, text_col, gram).localCheckpoint(eager=False)
    top = tc.orderBy(F.desc("cnt"), "tok").limit(top_k)
    sketch = cms_build(tc, depth, width)
    est = cms_estimate(sketch, top.select("tok"), depth, width)
    return (
        top.join(est, "tok")
        .select("tok", "cnt", "cms_est",
                (F.col("cms_est") - F.col("cnt")).alias("overshoot"))
        .orderBy(F.desc("cnt"), "tok")
    )
