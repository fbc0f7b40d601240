"""Update-aware web graph (streaming/web_graph_versioned.py): the
maintained edge set must equal a from-scratch web_link_edges over the
LATEST version of every page after EVERY batch — including updates
that REMOVE links (the retraction the append-only twin cannot
express), either-endpoint edge support, dangling anchors resolving
against latest (not historical) links, replays, and crash windows."""

from __future__ import annotations

import os

from pyspark.sql import Row

from hummingbird_spark.operators.graph import web_link_edges
from hummingbird_spark.streaming.web_graph_versioned import (
    read_web_edges_versioned,
    web_graph_versioned_batch,
)

HOST = "https://g.example"


def _page(links):
    anchors = "".join(f'<a href="{u}">l</a>' for u in links)
    return f"<html><body><p>text body here</p>{anchors}</body></html>"


def _row(i, links):
    return Row(doc_id=i, base=f"{HOST}/p/{i}", html=_page(links))


def _url(i):
    return f"{HOST}/p/{i}"


class Harness:
    def __init__(self, spark, tmp_path):
        self.spark = spark
        self.paths = tuple(str(tmp_path / x)
                           for x in ("lk", "vs", "pg", "ed"))
        self.latest: dict[int, Row] = {}
        self.seq = 0

    def apply(self, rows, batch_id=None):
        for r in rows:
            self.latest[r.doc_id] = r
        web_graph_versioned_batch(
            self.spark, self.spark.createDataFrame(rows),
            *self.paths,
            batch_id=self.seq if batch_id is None else batch_id)
        self.seq += 1

    def maintained(self):
        return sorted(
            (r.a, r.b) for r in read_web_edges_versioned(
                self.spark, self.paths[3]).collect())

    def from_scratch(self):
        df = self.spark.createDataFrame(list(self.latest.values()))
        return sorted((r.a, r.b)
                      for r in web_link_edges(df).collect())

    def check(self):
        assert self.maintained() == self.from_scratch()


def test_update_retracts_removed_links(spark, tmp_path):
    h = Harness(spark, tmp_path)
    # v1: 0 -> 1, 1 -> 2 (one-way links)
    h.apply([_row(0, [_url(1)]), _row(1, [_url(2)]),
             _row(2, [])])
    h.check()
    assert h.maintained() == [(0, 1), (1, 2)]

    # page 0 v2 drops its only link: edge (0,1) must RETRACT
    h.apply([_row(0, [])])
    h.check()
    assert h.maintained() == [(1, 2)]

    # page 0 v3 links 2 instead: (0,2) appears, (0,1) stays gone
    h.apply([_row(0, [_url(2)])])
    h.check()
    assert h.maintained() == [(0, 2), (1, 2)]


def test_either_endpoint_support_survives(spark, tmp_path):
    h = Harness(spark, tmp_path)
    # mutual links: 0 <-> 1
    h.apply([_row(0, [_url(1)]), _row(1, [_url(0)])])
    assert h.maintained() == [(0, 1)]
    # 0 drops its link — edge SURVIVES (1 still links 0)
    h.apply([_row(0, [])])
    h.check()
    assert h.maintained() == [(0, 1)]
    # 1 drops too — now it retracts
    h.apply([_row(1, [])])
    h.check()
    assert h.maintained() == []


def test_dangling_resolution_uses_latest_links(spark, tmp_path):
    h = Harness(spark, tmp_path)
    # v1: 0 links the not-yet-crawled 7 AND the not-yet-crawled 8
    h.apply([_row(0, [_url(7), _url(8)])])
    assert h.maintained() == []
    # 0 v2 drops the 8 link, keeps 7
    h.apply([_row(0, [_url(7)])])
    h.check()
    # 7 and 8 arrive: only (0,7) appears — 8's old anchor is not in
    # 0's LATEST version
    h.apply([_row(7, []), _row(8, [])])
    h.check()
    assert h.maintained() == [(0, 7)]


def test_replay_and_crash_window_converge(spark, tmp_path):
    h = Harness(spark, tmp_path)
    h.apply([_row(0, [_url(1)]), _row(1, [_url(2)]), _row(2, [])],
            batch_id=0)
    want = h.maintained()

    # exact replay is a ledger no-op
    web_graph_versioned_batch(
        spark, spark.createDataFrame(
            [_row(0, [_url(1)]), _row(1, [_url(2)]), _row(2, [])]),
        *h.paths, batch_id=0)
    assert h.maintained() == want

    # crash window: batch 1 (an update dropping 0->1) landed its
    # LINKS + VERSIONS appends but not the ops append or ledger —
    # simulate by hand-appending the facts, then replay end-to-end
    upd = [_row(0, [])]
    spark.createDataFrame([Row(src=0, curl="x-none", seq=1)]) \
        .limit(0).write.mode("append").parquet(h.paths[0])
    spark.createDataFrame([Row(tgt=0, seq=1)]) \
        .write.mode("append").parquet(h.paths[1])
    h.apply(upd, batch_id=1)
    h.check()
    assert h.maintained() == [(1, 2)]

    # wiped ledger: replaying both batches converges
    os.remove(h.paths[3] + ".ledger")
    h.apply([_row(0, [_url(1)]), _row(1, [_url(2)]), _row(2, [])],
            batch_id=0)
    h.apply(upd, batch_id=1)
    # batch 0's replay re-adds nothing: its +1 ops carry seq 0 and
    # lose to batch 1's seq-1 retraction under max-seq-wins... but
    # the LATEST state is what matters and batch 1 replays after
    h.check()
    assert h.maintained() == [(1, 2)]


def test_chaos_kill_in_every_append_window(spark, tmp_path):
    """Kill the update batch after every prefix of the four appends
    (none / links / +versions / +pages / all-but-ledger); the replay
    must converge to the clean twin's state in every window."""
    from hummingbird_spark.streaming.web_graph_versioned import (
        _versioned_delta,
    )

    b0 = [_row(0, [_url(1), _url(2)]), _row(1, [_url(0)]),
          _row(2, [])]
    # batch 1: page 0 drops BOTH links, page 1 keeps its link
    b1 = [_row(0, [])]

    # clean twin
    clean = Harness(spark, tmp_path / "clean")
    clean.apply(b0, batch_id=0)
    clean.apply(b1, batch_id=1)
    want = clean.maintained()
    assert want == [(0, 1)]  # (0,1) survives via 1->0; (0,2) gone

    for k in range(5):
        h = Harness(spark, tmp_path / f"w{k}")
        h.apply(b0, batch_id=0)
        deltas = _versioned_delta(
            spark, spark.createDataFrame(b1), *h.paths, 1)
        for df, path in list(zip(deltas, h.paths))[:k]:
            df.write.mode("append").parquet(path)
        # ledger never recorded batch 1 -> restart replays it
        h.apply(b1, batch_id=1)
        assert h.maintained() == want, f"window {k}"


def test_versioned_edges_feed_pagerank_unchanged(spark, tmp_path):
    """read_web_edges_versioned returns the exact (a, b) shape the
    graph operators consume: PageRank over the maintained store
    equals PageRank over the from-scratch latest-version build —
    including after an update changed the topology."""
    from hummingbird_spark.operators.graph import pagerank_scaled

    h = Harness(spark, tmp_path)
    h.apply([_row(0, [_url(1)]), _row(1, [_url(2)]),
             _row(2, [_url(0)])])
    h.apply([_row(0, [_url(2)])])  # update rewires 0->1 to 0->2
    h.check()

    maintained = read_web_edges_versioned(spark, h.paths[3])
    scratch = web_link_edges(
        spark.createDataFrame(list(h.latest.values())))
    pr_m = {r.node: r.rank_scaled for r in
            pagerank_scaled(maintained, rounds=2).collect()}
    pr_s = {r.node: r.rank_scaled for r in
            pagerank_scaled(scratch, rounds=2).collect()}
    assert pr_m == pr_s and len(pr_m) >= 2


def test_intra_batch_dedup_and_self_links(spark, tmp_path):
    h = Harness(spark, tmp_path)
    # two raw variants of one canonical in a batch + a self-link
    rows = [
        Row(doc_id=3, base=f"{HOST}/p/3?utm_source=x",
            html=_page([_url(3), _url(4)])),
        Row(doc_id=3, base=f"{HOST}/p/3",
            html=_page([_url(4)])),
        _row(4, []),
    ]
    for r in rows:
        h.latest[r.doc_id] = Row(doc_id=3, base=f"{HOST}/p/3",
                                 html=_page([_url(4)])) \
            if r.doc_id == 3 else r
    web_graph_versioned_batch(
        spark, spark.createDataFrame(rows), *h.paths, batch_id=0)
    h.seq = 1
    got = h.maintained()
    assert got == [(3, 4)]  # self-link filtered, one canonical row
