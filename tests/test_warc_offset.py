"""Offset-based WARC readers (sources/warc.py): the per-record-gzip
`.warc.gz` layout real Common Crawl ships, and uncompressed binary
WARC walked by Content-Length arithmetic. Contracts pinned here:

- a fixture-built multi-member `.warc.gz` parses byte-identically to
  the lineSep text path over the same records (the VERDICT r8 done
  criterion), and `read_warc` dispatches on the `.gz` suffix;
- the offset walk is immune to the two payloads the split paths
  cannot hold: bodies with blank lines (handled by the limit-3 split
  too, asserted here deterministically) and bodies containing the
  bare record magic (offset readers only);
- a record whose declared Content-Length lies resyncs at the next
  magic with length_ok=False instead of corrupting its neighbors.
"""

from __future__ import annotations

import gzip

from pyspark.sql import Row
from pyspark.sql import functions as F

from hummingbird_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    read_warc_binary,
    read_warc_gz,
    render_warc_record,
)

CRLF = "\r\n"
GAP = CRLF + CRLF


def _render(uri: str, body: str) -> str:
    http = ("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html"
            + GAP + body)
    return ("WARC/1.0" + CRLF
            + "WARC-Type: response" + CRLF
            + f"WARC-Target-URI: {uri}" + CRLF
            + f"Content-Length: {len(http)}" + GAP
            + http + GAP)


BODIES = [
    "plain single line",
    "<html>\r\n<body>\r\n\r\n<p>para one</p>\r\n\r\n"
    "<p>para two</p>\r\n</body>\r\n</html>",
    "",
    "trailing gap body" + GAP,
]
RECS = [(f"http://w.example/p{i}", b) for i, b in enumerate(BODIES)]


def _rows(df):
    return sorted(
        (r.target_uri, r.body, r.content_length, r.http_status,
         r.warc_type, r.length_ok)
        for r in df.collect())


def test_blank_line_bodies_roundtrip_split_path(spark):
    """The ADVICE r8 bug: an unlimited gap split truncated any body
    at its first blank line. The limit-3 parse must hold the whole
    body and validate Content-Length."""
    blob = "".join(_render(u, b) for u, b in RECS)
    out = parse_warc_records(
        spark.createDataFrame([Row(blob=blob)]), "blob") \
        .orderBy("rec_idx").collect()
    assert [r.body for r in out] == BODIES
    assert all(r.length_ok for r in out)
    assert all(r.http_status == "200" for r in out)


def test_gz_members_match_text_path(spark, tmp_path):
    text_file = tmp_path / "fix.warc"
    gz_file = tmp_path / "fix.warc.gz"
    text_file.write_bytes(
        "".join(_render(u, b) for u, b in RECS).encode("ascii"))
    with open(gz_file, "wb") as f:
        for u, b in RECS:
            f.write(gzip.compress(_render(u, b).encode("ascii")))

    via_text = _rows(read_warc(spark, str(text_file)))
    via_gz = _rows(read_warc(spark, str(gz_file)))  # suffix dispatch
    assert via_gz == via_text
    assert len(via_gz) == len(RECS)
    assert all(r[-1] for r in via_gz)  # every member length_ok
    # and the renderer the queries use produces the same wire bytes
    rendered = spark.createDataFrame(
        [Row(uri=u, body=b) for u, b in RECS]) \
        .select(render_warc_record(F.col("uri"), F.col("body"))
                .alias("r")).collect()
    assert sorted(r.r for r in rendered) == \
        sorted(_render(u, b) for u, b in RECS)


def test_binary_walk_holds_magic_in_body(spark, tmp_path):
    """Payloads containing the bare record magic break any
    split-on-magic parse; the Content-Length walk must carve through
    them byte-exactly."""
    evil = "looks like a record: WARC/1.0\r\nWARC-Type: fake\r\n\r\nx"
    recs = [("http://w.example/a", evil),
            ("http://w.example/b", "normal body")]
    f = tmp_path / "evil.warc"
    f.write_bytes("".join(_render(u, b) for u, b in recs)
                  .encode("ascii"))
    got = _rows(read_warc_binary(spark, str(f)))
    assert [(u, b) for u, b, *_ in got] == sorted(
        (u, b) for u, b in recs)
    assert all(r[-1] for r in got)

    # gz variant of the same payloads
    g = tmp_path / "evil.warc.gz"
    with open(g, "wb") as fh:
        for u, b in recs:
            fh.write(gzip.compress(_render(u, b).encode("ascii")))
    assert _rows(read_warc_gz(spark, str(g))) == got


def test_write_warc_gz_roundtrips(spark, tmp_path):
    """The writer's output is the layout read_warc_gz reads: bodies
    roundtrip (including non-ASCII, where Content-Length counts
    octets), warc_type carries, and every member validates."""
    from pyspark.sql import Row

    from hummingbird_spark.sources.warc import write_warc_gz

    rows = [
        Row(canonical_url="https://w.example/a",
            text="plain ascii body"),
        Row(canonical_url="https://w.example/b",
            text="non-ascii: café — naïve \U0001F600"),
        Row(canonical_url="https://w.example/c",
            text="blank\r\n\r\nline body"),
        Row(canonical_url="https://w.example/d", text=""),
    ]
    out = str(tmp_path / "wet")
    manifest = write_warc_gz(spark.createDataFrame(rows), out).collect()
    assert sum(m.n_records for m in manifest) == len(rows)

    got = {r.target_uri: r for r in
           read_warc_gz(spark, out + "/*.warc.gz").collect()}
    assert {u: r.body for u, r in got.items()} == {
        r.canonical_url: r.text for r in rows}
    assert all(r.length_ok for r in got.values())
    assert all(r.warc_type == "conversion" for r in got.values())


def test_cdx_index_point_reads_match_full_read(spark, tmp_path):
    """The writer's CDX sidecar enables record-range reads: the
    indexed fetch of EVERY record equals the full-file read, a
    filtered fetch returns exactly the selected records (by seeking
    only their members), and index=False writes no sidecar."""
    import glob as _glob

    from pyspark.sql import Row

    from hummingbird_spark.sources.warc import (
        fetch_warc_records,
        read_warc_gz_index,
        write_warc_gz,
    )

    rows = [Row(canonical_url=f"https://w.example/p{i}",
                text=f"body number {i} café \r\n\r\n tail {i}")
            for i in range(9)]
    out = str(tmp_path / "wet_idx")
    write_warc_gz(spark.createDataFrame(rows).repartition(3),
                  out).collect()
    sidecars = _glob.glob(out + "/*.cdx.parquet")
    warcs = _glob.glob(out + "/*.warc.gz")
    assert len(sidecars) == len(warcs) >= 1

    idx = read_warc_gz_index(spark, out)
    assert idx.count() == len(rows)
    # indexed read of everything == full-file read
    full = _rows(read_warc_gz(spark, out + "/*.warc.gz"))
    assert _rows(fetch_warc_records(spark, idx)) == full

    # point lookup: exactly the selected records come back
    want = {"https://w.example/p2", "https://w.example/p7"}
    sel = idx.filter(F.col("target_uri").isin(*want))
    got = fetch_warc_records(spark, sel).collect()
    assert {r.target_uri for r in got} == want
    assert all(r.length_ok for r in got)
    assert {r.body for r in got} == {
        "body number 2 café \r\n\r\n tail 2",
        "body number 7 café \r\n\r\n tail 7"}

    # opt-out writes no sidecar
    out2 = str(tmp_path / "wet_noidx")
    write_warc_gz(spark.createDataFrame(rows), out2,
                  index=False).collect()
    assert _glob.glob(out2 + "/*.cdx.parquet") == []


def test_index_backfill_external_files(spark, tmp_path):
    """index_warc_gz backfills sidecars for .warc.gz files we did
    not write (hand-assembled per-record members here): the indexed
    fetch equals the full read, and already-indexed files skip."""
    from hummingbird_spark.sources.warc import (
        fetch_warc_records,
        index_warc_gz,
        read_warc_gz,
        read_warc_gz_index,
    )

    d = tmp_path / "external"
    d.mkdir()
    for fi in range(2):
        members = b"".join(
            gzip.compress(_render(
                f"http://x.example/f{fi}/p{i}",
                f"body {fi}-{i} with magic WARC/1.0\r\n inside"
            ).encode()) for i in range(4))
        (d / f"crawl-{fi}.warc.gz").write_bytes(members)

    man = index_warc_gz(spark, str(d) + "/*.warc.gz").collect()
    assert sorted(m.indexed for m in man) == [True, True]
    assert sum(m.n_records for m in man) == 8

    idx = read_warc_gz_index(spark, str(d))
    assert idx.count() == 8
    assert _rows(fetch_warc_records(spark, idx)) == _rows(
        read_warc_gz(spark, str(d) + "/*.warc.gz"))

    # second pass: sidecars exist, nothing re-indexed
    man2 = index_warc_gz(spark, str(d) + "/*.warc.gz").collect()
    assert sorted(m.indexed for m in man2) == [False, False]


def test_lying_content_length_resyncs(spark, tmp_path):
    """First record declares 5 bytes too few; the walker must resync
    at the next magic, flag the liar, and parse the second record
    intact."""
    good_http = ("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html"
                 + GAP + "honest body")
    liar = ("WARC/1.0" + CRLF
            + "WARC-Type: response" + CRLF
            + "WARC-Target-URI: http://w.example/liar" + CRLF
            + f"Content-Length: {len(good_http) - 5}" + GAP
            + good_http + GAP)
    f = tmp_path / "liar.warc"
    f.write_bytes(
        (liar + _render("http://w.example/honest", "fine body"))
        .encode("ascii"))
    got = {r[0]: r for r in _rows(read_warc_binary(spark, str(f)))}
    assert got["http://w.example/honest"][1] == "fine body"
    assert got["http://w.example/honest"][-1] is True
    assert got["http://w.example/liar"][-1] is False
