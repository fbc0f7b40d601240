"""Incremental link-graph maintenance: the maintained rare-trigram
edge store must equal a from-scratch batch build after EVERY batch —
including across df drift in both directions (a shingle crossing
max_df retracts its pairs; one reaching min_df injects them) — and
the ledger/replay discipline must hold (wiped-checkpoint restart and
crash-window double-apply are no-ops)."""

from __future__ import annotations

import json
import os
import shutil

from hummingbird_spark.operators.graph import rare_trigram_edges

SCHEMA = "doc_id long, text string"
MIN_DF, MAX_DF = 2, 3

# P1 = "alpha beta gamma", P2 = "delta epsilon zeta"; fillers are
# per-doc-unique words so no accidental shared trigrams exist
BATCHES = [
    # df(P1)=2 -> edge (1,2); df(P2)=1 -> nothing
    [(1, "u1a u1b alpha beta gamma u1c"),
     (2, "u2a alpha beta gamma u2b u2c"),
     (3, "u3a u3b delta epsilon zeta u3c")],
    # df(P2)=2 -> edge (3,4) ARRIVES; df(P1)=4 > max_df -> edge (1,2)
    # RETRACTS
    [(4, "u4a delta epsilon zeta u4b"),
     (5, "u5a alpha beta gamma u5b"),
     (6, "u6a u6b alpha beta gamma")],
    # df(P2)=3 (still rare): pairs (3,4),(3,7),(4,7)
    [(7, "u7a delta epsilon zeta u7b u7c")],
]


def _expected(spark, upto):
    docs = [d for b in BATCHES[:upto] for d in b]
    return sorted(
        (r.a, r.b)
        for r in rare_trigram_edges(
            spark.createDataFrame(docs, SCHEMA),
            min_df=MIN_DF, max_df=MAX_DF).collect())


def _stored(spark, edges_path):
    from hummingbird_spark.streaming.graph import read_link_edges

    return sorted((r.a, r.b)
                  for r in read_link_edges(spark, edges_path).collect())


def test_store_equals_from_scratch_after_every_batch(spark, tmp_path):
    from hummingbird_spark.streaming.graph import apply_link_graph_batch

    postings = str(tmp_path / "postings")
    edges = str(tmp_path / "edges")
    for i, batch in enumerate(BATCHES):
        apply_link_graph_batch(
            spark, spark.createDataFrame(batch, SCHEMA),
            postings, edges, min_df=MIN_DF, max_df=MAX_DF,
            batch_id=i)
        assert _stored(spark, edges) == _expected(spark, i + 1), \
            f"store diverged from from-scratch build after batch {i}"
    # the drift really happened: (1,2) existed after batch 1 and is
    # gone now; (3,4) was absent after batch 1 and is present now
    assert (1, 2) in _expected(spark, 1)
    assert (1, 2) not in _stored(spark, edges)
    assert (3, 4) not in _expected(spark, 1)
    assert (3, 4) in _stored(spark, edges)


def test_crash_window_double_apply_converges(spark, tmp_path):
    """A batch re-applied WITHOUT ledger protection (batch_id=None
    twice — the crash landed between the postings append and the
    ledger rename) double-appends postings; the distinct-df
    discipline absorbs the duplicates, the edge store converges to
    the identical state, and LATER batches still match from-scratch."""
    from hummingbird_spark.streaming.graph import apply_link_graph_batch

    postings = str(tmp_path / "postings")
    edges = str(tmp_path / "edges")
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    apply_link_graph_batch(spark, b0, postings, edges,
                           min_df=MIN_DF, max_df=MAX_DF)
    once = _stored(spark, edges)
    apply_link_graph_batch(spark, b0, postings, edges,
                           min_df=MIN_DF, max_df=MAX_DF)
    assert _stored(spark, edges) == once == _expected(spark, 1)
    # duplicates really landed (the test exercises the replay path)
    n_postings = spark.read.parquet(postings).count()
    n_distinct = spark.read.parquet(postings).distinct().count()
    assert n_postings == 2 * n_distinct
    for i, batch in enumerate(BATCHES[1:], start=1):
        apply_link_graph_batch(
            spark, spark.createDataFrame(batch, SCHEMA),
            postings, edges, min_df=MIN_DF, max_df=MAX_DF,
            batch_id=i)
        assert _stored(spark, edges) == _expected(spark, i + 1)


def test_streaming_end_to_end_and_wiped_checkpoint_replay(
        spark, tmp_path):
    from hummingbird_spark.streaming.graph import (
        start_streaming_link_graph,
    )

    src = str(tmp_path / "in")
    postings = str(tmp_path / "postings")
    edges = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    for i, batch in enumerate(BATCHES):
        with open(os.path.join(src, f"{i}.json"), "w") as fh:
            for doc_id, text in batch:
                fh.write(json.dumps({"doc_id": doc_id, "text": text})
                         + "\n")

    q = start_streaming_link_graph(
        spark, src, postings, edges, SCHEMA,
        min_df=MIN_DF, max_df=MAX_DF, checkpoint=ckpt,
        max_files_per_trigger=1)
    assert q.awaitTermination(180)
    assert _stored(spark, edges) == _expected(spark, len(BATCHES))
    n_postings = spark.read.parquet(postings).count()

    # wiped checkpoint: the batch-id ledger makes the full replay a
    # no-op — same edges, NO duplicate postings appended
    shutil.rmtree(ckpt)
    q = start_streaming_link_graph(
        spark, src, postings, edges, SCHEMA,
        min_df=MIN_DF, max_df=MAX_DF, checkpoint=ckpt,
        max_files_per_trigger=1)
    assert q.awaitTermination(180)
    assert _stored(spark, edges) == _expected(spark, len(BATCHES))
    assert spark.read.parquet(postings).count() == n_postings


def test_maintained_edges_feed_the_batch_graph_operators(
        spark, tmp_path):
    """The maintained store is a drop-in edge list for the iterative
    operators: PageRank over the store equals PageRank over the
    from-scratch edges (int64-exact, so plain equality)."""
    from hummingbird_spark.operators.graph import pagerank_scaled
    from hummingbird_spark.streaming.graph import (
        apply_link_graph_batch,
        read_link_edges,
    )

    postings = str(tmp_path / "postings")
    edges = str(tmp_path / "edges")
    for i, batch in enumerate(BATCHES):
        apply_link_graph_batch(
            spark, spark.createDataFrame(batch, SCHEMA),
            postings, edges, min_df=MIN_DF, max_df=MAX_DF,
            batch_id=i)
    docs = spark.createDataFrame(
        [d for b in BATCHES for d in b], SCHEMA)
    via_store = sorted(
        tuple(r) for r in pagerank_scaled(
            read_link_edges(spark, edges), rounds=2).collect())
    via_batch = sorted(
        tuple(r) for r in pagerank_scaled(
            rare_trigram_edges(docs, min_df=MIN_DF, max_df=MAX_DF),
            rounds=2).collect())
    assert via_store == via_batch and via_store


def test_postings_compaction_preserves_state(spark, tmp_path):
    """compact_every rewrites the append-only postings store through
    the verified compaction swap mid-stream; the maintained edges and
    subsequent batches are unaffected, and the file count drops."""
    import glob

    from hummingbird_spark.streaming.graph import apply_link_graph_batch

    postings = str(tmp_path / "postings")
    edges = str(tmp_path / "edges")
    # compact after every 2nd applied batch
    for i, batch in enumerate(BATCHES):
        apply_link_graph_batch(
            spark, spark.createDataFrame(batch, SCHEMA),
            postings, edges, min_df=MIN_DF, max_df=MAX_DF,
            batch_id=i, compact_every=2)
        assert _stored(spark, edges) == _expected(spark, i + 1)
    # postings content unchanged by the rewrites
    got = sorted(tuple(r) for r in
                 spark.read.parquet(postings).collect())
    assert len(got) == len(set(got))  # no duplicate facts
    # fewer files than an uncompacted 3-batch append would carry
    uncompacted = str(tmp_path / "postings_raw")
    for i, batch in enumerate(BATCHES):
        apply_link_graph_batch(
            spark, spark.createDataFrame(batch, SCHEMA),
            uncompacted, str(tmp_path / "edges_raw"),
            min_df=MIN_DF, max_df=MAX_DF, batch_id=i,
            compact_every=0)
    n_c = len(glob.glob(f"{postings}/*.parquet"))
    n_u = len(glob.glob(f"{uncompacted}/*.parquet"))
    assert n_c < n_u
