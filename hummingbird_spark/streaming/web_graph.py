"""Incremental web-graph maintenance: continuous crawled-page
ingestion keeping a persisted anchor-link edge store consistent with
a from-scratch `operators/graph.py::web_link_edges` build over every
page ingested — the streaming twin of the batch web graph, the way
streaming/graph.py twins the rare-trigram graph.

Simpler than the trigram case BY CONSTRUCTION: there is no df drift.
A crawled page's canonical URL and its extracted links are immutable
facts, so BOTH fact stores are append-only, and edges (links joined
to pages on canonical URL) only ever APPEAR — a link extracted today
becomes an edge the day its target is crawled, and nothing ever
retracts. The per-batch delta is therefore bounded joins:

    new_edges = (batch links x all_pages) — this batch's anchors
                                            hitting anything crawled
              ∪ (all_links x batch pages) — OLD dangling anchors whose
                                            target just arrived
    (deduped, minus edges already in the store)

where "this batch's" facts are the batch's NEW facts plus, for batch
canonicals already accepted, the accepted version's facts recovered
from the stores — the recovery that makes the crash window sound (see
below). Delta cost scales with the batch's links plus the store rows
matching the batch's canonical URLs / page ids — equi-joins, never a
rescan of the whole graph.

Crash-window semantics (shared contract, streaming/ledger.py): fact
appends land BEFORE the edge append and the ledger, and LINKS land
before PAGES. The ordering matters: replay recovery keys off the
pages store ("batch canonical already accepted" => recover the
accepted facts from the stores), so every fact visible in the pages
store must already have its links in the links store. Links-first
makes each window recoverable: (a) crash after the links append —
the batch's canonicals are NOT yet in the pages store, so replay
treats the whole batch as fresh and the duplicate link rows die in
the distinct read; (b) crash after both fact appends — replay finds
the canonicals accepted and re-derives their edges from the STORED
facts (store-semi-joined on the batch's keys, so still
batch-bounded). Pages-first would leave window (a) with accepted
canonicals whose links exist NOWHERE — permanent edge loss, the
non-recoverable failure the ledger contract forbids. A genuine
re-crawl takes the recovery path and contributes nothing: the
accepted version's edges exist by the per-batch invariant and die in
the edge-store anti-join. All three directions are asserted by the
crash-window and re-crawl tests. Wiped-checkpoint restarts are
no-ops via the batch-id ledger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hummingbird_spark.functions.html import canonical_url, extract_links
from hummingbird_spark.streaming.ledger import BatchLedger


def _read_distinct(spark: SparkSession, path: str,
                   cols: list[str]) -> DataFrame | None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path).select(*cols).distinct()
    return None


def web_graph_batch_delta(
    spark: SparkSession,
    batch_pages: DataFrame,
    pages_path: str,
    links_path: str,
    edges_path: str,
    id_col: str = "doc_id",
    base_col: str = "base",
    html_col: str = "html",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One maintenance round: returns (new_pages, new_links,
    new_edges) — the three append deltas. Re-crawled canonical URLs
    (already in the pages store) and intra-batch canonical ties
    (smallest id wins) are dropped first, mirroring the crawl-ingest
    accept-once discipline."""
    tagged = (
        batch_pages.select(
            F.col(id_col).alias("tgt"),
            canonical_url(F.col(base_col)).alias("curl"),
            F.col(base_col).alias("base"),
            F.col(html_col).alias("html"))
        .groupBy("curl")
        .agg(F.min(F.struct("tgt", "base", "html")).alias("w"))
        .select("curl", F.col("w.tgt").alias("tgt"),
                F.col("w.base").alias("base"),
                F.col("w.html").alias("html"))
    )
    pages_store = _read_distinct(spark, pages_path, ["curl", "tgt"])
    links_store = _read_distinct(spark, links_path, ["src", "curl"])
    if pages_store is not None:
        fresh = tagged.join(pages_store.select("curl"), "curl",
                            "left_anti")
        # batch canonicals already accepted: either a crashed replay
        # (their facts landed but the edge append did not) or a
        # genuine re-crawl. Recover THE ACCEPTED VERSION's facts from
        # the stores — bounded by batch size — so replays re-derive
        # their missing edges while re-crawled content contributes
        # nothing (its edges exist by the per-batch invariant and die
        # in the anti-join below).
        known = pages_store.join(tagged.select("curl"), "curl",
                                 "left_semi")
    else:
        fresh, known = tagged, None
    new_pages = fresh.select("curl", "tgt")
    new_links = fresh.select(
        F.col("tgt").alias("src"),
        F.explode(extract_links(F.col("html"), F.col("base")))
        .alias("url"),
    ).select("src", canonical_url(F.col("url")).alias("curl")) \
        .distinct()

    all_pages = (new_pages if pages_store is None
                 else pages_store.unionByName(new_pages))
    batch_pages_all = (new_pages if known is None
                       else new_pages.unionByName(known))
    cand_links = new_links
    if known is not None and links_store is not None:
        replay_links = links_store.join(
            known.select(F.col("tgt").alias("src")), "src",
            "left_semi")
        cand_links = cand_links.unionByName(replay_links)

    def _edges(links: DataFrame, pages: DataFrame) -> DataFrame:
        return (
            links.join(pages, "curl")
            .filter(F.col("src") != F.col("tgt"))
            .select(F.least("src", "tgt").alias("a"),
                    F.greatest("src", "tgt").alias("b"))
        )

    delta = _edges(cand_links, all_pages)
    if links_store is not None:
        delta = delta.unionByName(_edges(links_store, batch_pages_all))
    delta = delta.distinct()
    edges_store = _read_distinct(spark, edges_path, ["a", "b"])
    if edges_store is not None:
        delta = delta.join(edges_store, ["a", "b"], "left_anti")
    return new_pages, new_links, delta


def apply_web_graph_batch(
    spark: SparkSession,
    batch_pages: DataFrame,
    pages_path: str,
    links_path: str,
    edges_path: str,
    id_col: str = "doc_id",
    base_col: str = "base",
    html_col: str = "html",
    batch_id: int | None = None,
    compact_every: int = 32,
) -> None:
    """Compute the delta and append all three stores. All plans
    materialize BEFORE any store mutates (they read the stores they
    update); links append FIRST, then pages, then edges + ledger —
    see the module docstring for why links must precede pages."""
    led = BatchLedger(edges_path)
    if led.seen(batch_id):
        return
    new_pages, new_links, new_edges = web_graph_batch_delta(
        spark, batch_pages, pages_path, links_path, edges_path,
        id_col, base_col, html_col)
    new_pages = new_pages.localCheckpoint(eager=True)
    new_links = new_links.localCheckpoint(eager=True)
    new_edges = new_edges.localCheckpoint(eager=True)
    new_links.write.mode("append").parquet(links_path)
    new_pages.write.mode("append").parquet(pages_path)
    new_edges.write.mode("append").parquet(edges_path)
    led.record(batch_id)
    if (compact_every and batch_id is not None
            and len(led.applied()) % compact_every == 0):
        from hummingbird_spark.operators.compact import compact_table

        for p in (pages_path, links_path, edges_path):
            compact_table(spark, p)


def start_streaming_web_graph(
    spark: SparkSession,
    source_dir: str,
    pages_path: str,
    links_path: str,
    edges_path: str,
    schema,
    id_col: str = "doc_id",
    base_col: str = "base",
    html_col: str = "html",
    checkpoint: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source parquet stream of crawled pages -> per-batch web
    graph maintenance. The maintained edge set equals a from-scratch
    web_link_edges over everything ingested, at every batch boundary
    (asserted in tests/test_streaming_web_graph.py)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_web_graph_batch(
            spark, batch_df, pages_path, links_path, edges_path,
            id_col, base_col, html_col, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation",
                checkpoint or edges_path + "._checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def read_web_edges(spark: SparkSession, edges_path: str) -> DataFrame:
    """The maintained undirected edge list (a < b) — the exact shape
    operators/graph.py::web_link_edges returns."""
    return spark.read.parquet(edges_path).select("a", "b").distinct()
