"""Streaming crawl ingestion: re-crawled URLs (messy variants of an
accepted canonical) drop on store hits, intra-batch variants keep the
smallest raw URL, blocked domains never land, extraction runs on
survivors only, and a wiped-checkpoint replay is a no-op."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import types as T

from hummingbird_spark.streaming.crawl import (
    start_streaming_crawl_ingest,
)

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("html", T.StringType()),
])

BLOCKED = ("spam.example",)


def _page(body: str) -> str:
    return ('<html><body><nav><a href="/x">Home</a> <a href="/y">More'
            '</a></nav><p>' + body + '</p></body></html>')


def _run(spark, src, out, store):
    q = start_streaming_crawl_ingest(
        spark, src, out, store, SCHEMA, blocked_domains=BLOCKED)
    assert q.awaitTermination(240)


def _drop_file(df, src, name):
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, os.path.join(src, name))
    shutil.rmtree(tmp)


def test_streaming_crawl_ingest(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    os.makedirs(src)

    # batch 0: one clean page, two messy variants of a second page
    # (same canonical — the lexicographically-smaller raw URL wins),
    # one blocked-domain page
    b0 = spark.createDataFrame([
        Row(url="https://a.example/p1",
            html=_page("first page body text here")),
        Row(url="HTTP://WWW.B.Example/p2/?utm_source=x",
            html=_page("second page body text here")),
        Row(url="http://b.example/p2?fbclid=9",
            html=_page("second page variant body")),
        Row(url="https://spam.example/p3",
            html=_page("blocked page body text")),
    ])
    _drop_file(b0, src, "b0.parquet")
    _run(spark, src, out, store)

    rows0 = {r.canonical_url: r for r in
             spark.read.parquet(out).collect()}
    assert set(rows0) == {"https://a.example/p1", "http://b.example/p2"}
    # min(struct) tie-break: "HTTP://WWW..." < "http://b..." (ASCII)
    assert rows0["http://b.example/p2"].url == \
        "HTTP://WWW.B.Example/p2/?utm_source=x"
    # extraction ran: nav boilerplate gone, body kept
    assert rows0["https://a.example/p1"].text == \
        "first page body text here"
    assert rows0["https://a.example/p1"].dropped_link == 1
    assert rows0["https://a.example/p1"].domain == "a.example"

    # batch 1: a re-crawl of p1 under a new messy URL (store hit ->
    # dropped) plus one genuinely new page
    b1 = spark.createDataFrame([
        Row(url="HTTPS://WWW.A.Example:443/p1#frag",
            html=_page("first page recrawled body")),
        Row(url="https://c.example/p4",
            html=_page("fourth page body text here")),
    ])
    _drop_file(b1, src, "b1.parquet")
    _run(spark, src, out, store)

    canon1 = {r.canonical_url for r in spark.read.parquet(out).collect()}
    assert canon1 == {"https://a.example/p1", "http://b.example/p2",
                      "https://c.example/p4"}
    n_out = spark.read.parquet(out).count()
    assert n_out == 3  # the re-crawl never re-landed
    assert spark.read.parquet(store).count() == 3

    # replay: wipe the checkpoint; the ledger alone makes both
    # batches no-ops
    shutil.rmtree(store + "._checkpoint")
    _run(spark, src, out, store)
    assert spark.read.parquet(out).count() == n_out
    assert spark.read.parquet(store).count() == 3


def test_streaming_crawl_robots_enforcement(spark, tmp_path):
    """Pages a disallow rule matches for the agent never land; the
    robots parquet is re-read per batch so policy updates apply."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    robots = str(tmp_path / "robots")
    os.makedirs(src)

    spark.createDataFrame([Row(
        host="a.example",
        robots_txt="User-agent: *\nDisallow: /private/",
    )]).write.mode("overwrite").parquet(robots)

    b0 = spark.createDataFrame([
        Row(url="https://a.example/public/1",
            html=_page("public page body text")),
        Row(url="https://a.example/private/2",
            html=_page("private page body text")),
    ])
    _drop_file(b0, src, "b0.parquet")
    q = start_streaming_crawl_ingest(
        spark, src, out, store,
        SCHEMA, robots_path=robots)
    assert q.awaitTermination(240)

    rows = spark.read.parquet(out).collect()
    assert {r.canonical_url for r in rows} == {"https://a.example/public/1"}
    assert spark.read.parquet(store).count() == 1
