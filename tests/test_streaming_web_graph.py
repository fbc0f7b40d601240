"""Incremental web-graph maintenance (streaming/web_graph.py): the
maintained edge store equals a from-scratch web_link_edges build over
everything ingested at EVERY batch boundary — including the hard
direction (an old page's dangling anchor becoming an edge when its
target arrives in a later batch) — survives crash-window double
application, ignores re-crawls, feeds PageRank identically, and a
wiped-checkpoint replay is a no-op."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hummingbird_spark.operators.graph import (
    pagerank_scaled,
    web_link_edges,
)
from hummingbird_spark.plans.queries_web import _with_link_page
from hummingbird_spark.sources.tables import load_table
from hummingbird_spark.streaming.web_graph import (
    apply_web_graph_batch,
    read_web_edges,
    start_streaming_web_graph,
)

SF = "/root/testdata/sf0.001"
# three batches: the ring links (d -> d+1) guarantee cross-batch
# dangling anchors in both directions at each boundary
CUTS = [(0, 200), (200, 350), (350, 500)]


def _edge_set(df):
    return {(r.a, r.b) for r in df.collect()}


def _drop_file(df, src, name):
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0],
                os.path.join(src, name))
    shutil.rmtree(tmp)


def test_incremental_equals_from_scratch_every_batch(spark, tmp_path):
    pages = _with_link_page(load_table(spark, SF, "documents")) \
        .localCheckpoint(eager=True)
    src = str(tmp_path / "in")
    os.makedirs(src)
    paths = [str(tmp_path / p) for p in ("pages", "links", "edges")]

    for i, (lo, hi) in enumerate(CUTS):
        batch = pages.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        _drop_file(batch, src, f"b{i}.parquet")
        q = start_streaming_web_graph(
            spark, src, *paths, pages.schema,
            max_files_per_trigger=1)
        assert q.awaitTermination(300)
        scratch = web_link_edges(
            pages.filter(F.col("doc_id") < hi))
        assert _edge_set(read_web_edges(spark, paths[2])) == \
            _edge_set(scratch), f"divergence after batch {i}"

    # cross-batch direction really exercised: batch 2 created edges
    # for anchors extracted in earlier batches
    assert (199, 200) in _edge_set(read_web_edges(spark, paths[2]))

    # PageRank drop-in equality on the maintained store
    maintained = pagerank_scaled(read_web_edges(spark, paths[2]))
    scratch_pr = pagerank_scaled(web_link_edges(pages))
    assert sorted(map(tuple, maintained.collect())) == \
        sorted(map(tuple, scratch_pr.collect()))

    # wiped-checkpoint replay: ledger alone makes all batches no-ops
    n_edges = read_web_edges(spark, paths[2]).count()
    shutil.rmtree(paths[2] + "._checkpoint")
    q = start_streaming_web_graph(
        spark, src, *paths, pages.schema, max_files_per_trigger=1)
    assert q.awaitTermination(300)
    assert read_web_edges(spark, paths[2]).count() == n_edges


def test_double_apply_converges_and_recrawls_drop(spark, tmp_path):
    pages = _with_link_page(load_table(spark, SF, "documents")) \
        .filter(F.col("doc_id") < 120).localCheckpoint(eager=True)
    paths = [str(tmp_path / p) for p in ("pages", "links", "edges")]

    b0 = pages.filter(F.col("doc_id") < 60)
    b1 = pages.filter(F.col("doc_id") >= 60)
    apply_web_graph_batch(spark, b0, *paths)
    want0 = _edge_set(web_link_edges(b0))
    assert _edge_set(read_web_edges(spark, paths[2])) == want0

    # crash-window replay: batch_id=None is never ledger-recorded, so
    # a second application re-runs end-to-end — duplicate fact rows
    # land, but distinct reads + the edge anti-join converge
    apply_web_graph_batch(spark, b0, *paths)
    assert _edge_set(read_web_edges(spark, paths[2])) == want0

    apply_web_graph_batch(spark, b1, *paths)
    want = _edge_set(web_link_edges(pages))
    assert _edge_set(read_web_edges(spark, paths[2])) == want

    # a re-crawl batch (same canonical URLs again) changes nothing
    apply_web_graph_batch(spark, b0, *paths)
    assert _edge_set(read_web_edges(spark, paths[2])) == want


def test_crash_between_fact_append_and_edge_append(spark, tmp_path):
    """Simulate the worst crash window: batch facts (pages + links)
    landed but the edge append and ledger did not. The replay
    re-appends facts (duplicates) and re-derives the delta — distinct
    fact reads + the edge anti-join must converge to the exact
    from-scratch graph."""
    from hummingbird_spark.streaming.web_graph import (
        web_graph_batch_delta,
    )

    pages = _with_link_page(load_table(spark, SF, "documents")) \
        .filter(F.col("doc_id") < 100).localCheckpoint(eager=True)
    paths = [str(tmp_path / p) for p in ("pages", "links", "edges")]
    b0 = pages.filter(F.col("doc_id") < 50)
    b1 = pages.filter(F.col("doc_id") >= 50)
    apply_web_graph_batch(spark, b0, *paths)

    # batch 1 crashes mid-window: facts append, edges/ledger never do
    np_, nl, _ne = web_graph_batch_delta(spark, b1, *paths)
    np_.localCheckpoint(eager=True).write.mode("append") \
        .parquet(paths[0])
    nl.localCheckpoint(eager=True).write.mode("append") \
        .parquet(paths[1])

    # restart replays the batch end-to-end
    apply_web_graph_batch(spark, b1, *paths)
    assert _edge_set(read_web_edges(spark, paths[2])) == \
        _edge_set(web_link_edges(pages))


def test_crash_after_links_append_only(spark, tmp_path):
    """The window the links-before-pages ordering exists for: the
    batch's links landed but the pages append (and everything after)
    did not. Replay must treat the batch as fresh — its canonicals
    are not yet accepted — and converge; the duplicate link rows die
    in the distinct read. (The reverse ordering would leave accepted
    canonicals with links stored NOWHERE: permanent edge loss.)"""
    from hummingbird_spark.streaming.web_graph import (
        web_graph_batch_delta,
    )

    pages = _with_link_page(load_table(spark, SF, "documents")) \
        .filter(F.col("doc_id") < 100).localCheckpoint(eager=True)
    paths = [str(tmp_path / p) for p in ("pages", "links", "edges")]
    b0 = pages.filter(F.col("doc_id") < 50)
    b1 = pages.filter(F.col("doc_id") >= 50)
    apply_web_graph_batch(spark, b0, *paths)

    # batch 1 crashes right after the FIRST append (links only)
    _np, nl, _ne = web_graph_batch_delta(spark, b1, *paths)
    nl.localCheckpoint(eager=True).write.mode("append") \
        .parquet(paths[1])

    # restart replays the batch end-to-end
    apply_web_graph_batch(spark, b1, *paths)
    assert _edge_set(read_web_edges(spark, paths[2])) == \
        _edge_set(web_link_edges(pages))
    # and the pages store holds exactly one row per accepted canonical
    ps = spark.read.parquet(paths[0])
    assert ps.count() == ps.select("curl").distinct().count()
