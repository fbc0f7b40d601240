"""WARC (Web ARChive, ISO 28500) record source — the wire format
Common-Crawl-scale ingestion actually reads. No reference analogue
(the reference ingests live collections; SURVEY §2.1): this is the
crawl-file front end a 100 TB training-data pipeline bolts on.

Two entry points:

- `read_warc(spark, path)` — the scale path. `spark.read.text` with
  `lineSep` set to the record header magic splits a multi-record WARC
  file into one row per record AT THE SOURCE (Hadoop's LineRecordReader
  honors custom delimiters on uncompressed text, so files split across
  executors without any whole-file rows). 1 GB crawl files never
  materialize as single strings.

- `parse_warc_records(df, blob_col)` — in-memory variant for blobs
  already in a column (fixtures, message queues): split on the same
  magic, explode, then the identical per-record parse.

Both share `_parse_record`, a pure Column expression chain (header
fields via regexp_extract, HTTP status + body via bounded splits) —
JVM-side, codegen, no UDFs. Content-Length is validated against the
HTTP payload so truncated records are detectable downstream.

- `read_warc_gz(spark, path)` / `read_warc_binary(spark, path)` —
  the offset-based reader for the layouts real Common Crawl ships:
  `.warc.gz` with ONE GZIP MEMBER PER RECORD (members walked with
  stdlib zlib inside an Arrow `mapInPandas` kernel) and uncompressed
  binary WARC (records walked by Content-Length arithmetic, no
  split-on-magic). Byte-exact: payloads may contain blank lines AND
  the record magic. Gzip members are not splittable without an
  external index, so the scale contract here is FILE-grain
  parallelism — exactly how Common Crawl shards (~64k files of ~1 GB
  per crawl); `binaryFile` scans distribute one file per task.

- `read_warc_gz_index` / `fetch_warc_records` — the POINT-LOOKUP
  path over that external index: `write_warc_gz` emits a CDX-style
  parquet sidecar (target_uri, offset, length) per file, and the
  fetch seeks + gunzips just the selected members — k records cost
  O(k) bytes read, never whole-file decompression (the standard
  Common Crawl CDX access pattern).

Simplification vs full ISO 28500 (documented contract): the split
parsers (`read_warc`/`parse_warc_records`) assume text payloads that
do not themselves contain the bare record magic; payloads WITH
embedded blank lines are handled (limit-3 split — everything after
the second gap is body). Payloads containing the magic, and binary
payloads, take the offset-based readers above.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = "\r\n"
RECORD_MAGIC = "WARC/1.0" + CRLF
_GAP = CRLF + CRLF


def render_warc_record(uri: F.Column, body: F.Column,
                       warc_type: str = "response") -> F.Column:
    """One WARC response record (Column expression). Content-Length
    covers the HTTP block (status line + headers + body), per spec.
    ASCII payload assumed, so char length == octet length."""
    http = F.concat(
        F.lit("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html"
              + _GAP),
        body,
    )
    return F.concat(
        F.lit(RECORD_MAGIC),
        F.lit(f"WARC-Type: {warc_type}" + CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("Content-Length: "), F.length(http).cast("string"),
        F.lit(_GAP),
        http,
        F.lit(_GAP),
    )


def _parse_record(rec: F.Column) -> list[F.Column]:
    """Parse one record's text (everything AFTER the magic): WARC
    headers, HTTP status line + headers, body. The split is
    limit-3 — the first gap ends the WARC headers, the second ends
    the HTTP headers, and EVERYTHING after the second is body (real
    \r\n-newline HTML contains blank lines freely; an unlimited
    split would silently truncate the body at the first one). The
    single trailing record gap the writer appends is stripped."""
    parts = F.split(rec, CRLF + CRLF, 3)
    warc_hdr = F.element_at(parts, 1)
    http_hdr = F.element_at(parts, 2)
    body = F.when(
        F.size(parts) >= 3,
        F.regexp_replace(F.element_at(parts, 3), CRLF + CRLF + "$",
                         ""),
    ).otherwise(F.lit(""))
    declared_len = F.regexp_extract(
        warc_hdr, r"(?m)^Content-Length: ([0-9]+)$", 1
    ).cast("long")
    http_len = (F.length(http_hdr) + F.lit(len(_GAP))
                + F.length(body)).cast("long")
    return [
        F.regexp_extract(warc_hdr, r"(?m)^WARC-Type: (\S+)$", 1)
        .alias("warc_type"),
        F.regexp_extract(warc_hdr, r"(?m)^WARC-Target-URI: (\S+)$", 1)
        .alias("target_uri"),
        declared_len.alias("content_length"),
        F.regexp_extract(http_hdr, r"^HTTP/1\.[01] ([0-9]{3})", 1)
        .alias("http_status"),
        body.alias("body"),
        (declared_len == http_len).alias("length_ok"),
    ]


def parse_warc_records(df: DataFrame, blob_col: str = "blob",
                       keep: tuple[str, ...] = ()) -> DataFrame:
    """Blob column of concatenated records -> one row per record with
    parsed fields. Pass-through columns listed in `keep` survive."""
    recs = F.split(F.col(blob_col), RECORD_MAGIC.replace(".", r"\."))
    exploded = df.select(
        *[F.col(c) for c in keep],
        F.posexplode(recs).alias("rec_idx", "__rec"),
    ).filter(F.length(F.trim(F.col("__rec"))) > 0)
    return exploded.select(
        *[F.col(c) for c in keep],
        F.col("rec_idx"),
        *_parse_record(F.col("__rec")),
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scale-path reader: record-grain splitting at the text source via
    a custom lineSep — no whole-file strings, splittable scans.
    `.warc.gz` paths dispatch to the offset-based member walker
    (per-record gzip members are the actual Common Crawl layout)."""
    if path.endswith(".gz"):
        return read_warc_gz(spark, path)
    raw = spark.read.option("lineSep", RECORD_MAGIC).text(path)
    recs = raw.filter(F.length(F.trim(F.col("value"))) > 0)
    return recs.select(*_parse_record(F.col("value")))


# ---------------------------------------------------------------------------
# Offset-based readers (binary / per-record-gzip) — Content-Length
# arithmetic, byte-exact. One Arrow kernel shared by both layouts.
# ---------------------------------------------------------------------------

_MAGIC_B = RECORD_MAGIC.encode("ascii")
_GAP_B = _GAP.encode("ascii")

PARSED_SCHEMA = ("warc_type string, target_uri string, "
                 "content_length long, http_status string, "
                 "body string, length_ok boolean")


def _parse_record_bytes(rec: bytes) -> tuple | None:
    """One record's bytes (starting at, or just after, the magic) ->
    the same 6-tuple the Column parser produces. The HTTP block is
    carved by the declared Content-Length — byte-exact, so payloads
    may contain blank lines and the record magic itself. length_ok
    verifies the member/record actually holds declared bytes followed
    by the record gap."""
    if rec.startswith(_MAGIC_B):
        rec = rec[len(_MAGIC_B):]
    gap_at = rec.find(_GAP_B)
    if gap_at < 0:
        return None
    warc_hdr = rec[:gap_at]
    m = re.search(rb"^Content-Length: ([0-9]+)\r?$", warc_hdr, re.M)
    declared = int(m.group(1)) if m else None
    block_start = gap_at + len(_GAP_B)
    if declared is not None:
        block = rec[block_start:block_start + declared]
        tail = rec[block_start + declared:]
        length_ok = (len(block) == declared
                     and tail in (_GAP_B, b"", CRLF.encode("ascii")))
    else:
        block = rec[block_start:]
        if block.endswith(_GAP_B):
            block = block[:-len(_GAP_B)]
        length_ok = False
    h = block.find(_GAP_B)
    http_hdr, body = (block[:h], block[h + len(_GAP_B):]) \
        if h >= 0 else (block, b"")
    t = re.search(rb"^WARC-Type: (\S+)\r?$", warc_hdr, re.M)
    u = re.search(rb"^WARC-Target-URI: (\S+)\r?$", warc_hdr, re.M)
    s = re.match(rb"HTTP/1\.[01] ([0-9]{3})", http_hdr)
    dec = (lambda b: b.decode("utf-8", errors="replace"))
    return (
        dec(t.group(1)) if t else "",
        dec(u.group(1)) if u else "",
        declared,
        dec(s.group(1)) if s else "",
        dec(body),
        length_ok,
    )


def _iter_records(data: bytes):
    """Walk concatenated records in uncompressed binary WARC by
    Content-Length arithmetic: header scan to the first gap, skip
    declared block + gap, expect the next magic. A record whose
    declared length does not land on the next magic resyncs by
    searching for it (and its length_ok is already False)."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_MAGIC_B, pos)
        if start < 0:
            return
        gap_at = data.find(_GAP_B, start)
        if gap_at < 0:
            yield data[start:]
            return
        hdr = data[start:gap_at]
        m = re.search(rb"^Content-Length: ([0-9]+)\r?$", hdr, re.M)
        if m:
            end = gap_at + len(_GAP_B) + int(m.group(1)) + len(_GAP_B)
            if end > n or (end < n
                           and data[end:end + len(_MAGIC_B)]
                           != _MAGIC_B):
                nxt = data.find(_MAGIC_B, start + len(_MAGIC_B))
                end = nxt if nxt >= 0 else n
        else:
            nxt = data.find(_MAGIC_B, start + len(_MAGIC_B))
            end = nxt if nxt >= 0 else n
        yield data[start:end]
        pos = end


def _iter_gzip_members(data: bytes):
    """Per-record gzip members (the Common Crawl `.warc.gz` layout),
    walked with stdlib zlib: each member decompresses independently;
    `unused_data` marks the next member boundary."""
    import zlib

    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _binary_warc_df(spark: SparkSession, path: str,
                    gz: bool) -> DataFrame:
    files = spark.read.format("binaryFile").load(path) \
        .select("content")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = bytes(content)
                members = (_iter_gzip_members(data) if gz
                           else _iter_records(data))
                for rec in members:
                    parsed = _parse_record_bytes(rec)
                    if parsed is not None:
                        rows.append(parsed)
            yield pd.DataFrame(
                rows, columns=["warc_type", "target_uri",
                               "content_length", "http_status",
                               "body", "length_ok"])

    return files.mapInPandas(kernel, PARSED_SCHEMA)


def read_warc_gz(spark: SparkSession, path: str) -> DataFrame:
    """Offset-based reader for `.warc.gz` with one gzip member per
    record. Not splittable within a file (gzip members need an
    external index) — parallelism is file-grain, matching how Common
    Crawl shards its corpus (~64k ~1 GB files per crawl); the
    `binaryFile` scan distributes one file per task and the per-task
    memory bound is one file's bytes."""
    return _binary_warc_df(spark, path, gz=True)


def read_warc_binary(spark: SparkSession, path: str) -> DataFrame:
    """Offset-based reader for uncompressed binary WARC: records
    walked by Content-Length arithmetic (no split-on-magic), so
    payloads may contain blank lines and the record magic. Same
    file-grain parallelism contract as `read_warc_gz`."""
    return _binary_warc_df(spark, path, gz=False)


# ---------------------------------------------------------------------------
# Writer: per-record-gzip WARC (the WET-style export layout)
# ---------------------------------------------------------------------------

def render_record_bytes(uri: str, body: str,
                        warc_type: str = "conversion") -> bytes:
    """One WARC record as bytes — the Python twin of
    `render_warc_record`, except Content-Length counts OCTETS of the
    utf-8-encoded block (the spec's unit), so non-ASCII payloads
    validate under the offset readers."""
    http = ("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html"
            + _GAP + body).encode("utf-8")
    head = (RECORD_MAGIC
            + f"WARC-Type: {warc_type}" + CRLF
            + f"WARC-Target-URI: {uri}" + CRLF
            + f"Content-Length: {len(http)}" + _GAP).encode("ascii")
    return head + http + _GAP_B


def write_warc_gz(df: DataFrame, out_dir: str,
                  uri_col: str = "canonical_url",
                  body_col: str = "text",
                  warc_type: str = "conversion",
                  index: bool = True) -> DataFrame:
    """Write (uri, body) rows as `.warc.gz` files with ONE GZIP
    MEMBER PER RECORD — the layout `read_warc_gz` reads and Common
    Crawl ships (WET-style conversion records by default). One file
    per input partition, written executor-side (out_dir must be a
    filesystem every executor can reach — the same contract as every
    path-based store in this package). Returns the manifest
    (file, n_records, n_bytes) — an action on it performs the
    write.

    With `index` (default), each file gets a CDX-style sidecar
    `<file>.cdx.parquet` recording (target_uri, offset, length, file)
    per member — the writer is the one place member boundaries are
    free. The sidecar is what makes record-range reads possible
    later (`read_warc_gz_index` + `fetch_warc_records`): gzip
    members are not splittable, so WITHOUT it a point lookup
    decompresses whole files."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def kernel(batches):
        import gzip
        import uuid

        import pandas as pd

        fname = os.path.join(out_dir,
                             f"part-{uuid.uuid4().hex}.warc.gz")
        fh = None
        n = 0
        nbytes = 0
        idx: list[tuple[str, int, int]] = []
        for pdf in batches:
            if len(pdf) and fh is None:
                fh = open(fname, "wb")
            for uri, body in zip(pdf[uri_col], pdf[body_col]):
                member = gzip.compress(render_record_bytes(
                    str(uri), "" if body is None else str(body),
                    warc_type))
                fh.write(member)
                if index:
                    idx.append((str(uri), nbytes, len(member)))
                n += 1
                nbytes += len(member)
        if fh is not None:
            fh.close()
            if index:
                import pyarrow as pa
                import pyarrow.parquet as pq

                tbl = pa.table({
                    "target_uri": [r[0] for r in idx],
                    "offset": pa.array([r[1] for r in idx],
                                       pa.int64()),
                    "length": pa.array([r[2] for r in idx],
                                       pa.int64()),
                    "file": [fname] * len(idx),
                })
                pq.write_table(tbl, fname + ".cdx.parquet")
            yield pd.DataFrame([(fname, n, nbytes)],
                               columns=["file", "n_records",
                                        "n_bytes"])
        else:
            yield pd.DataFrame(
                [], columns=["file", "n_records", "n_bytes"])

    return df.select(uri_col, body_col).mapInPandas(
        kernel, "file string, n_records long, n_bytes long")


def index_warc_gz(spark: SparkSession, path: str) -> DataFrame:
    """Backfill CDX sidecars for EXTERNAL `.warc.gz` files (crawl
    output we didn't write): one member-boundary walk per file —
    zlib's unused_data gives each member's compressed extent for
    free while decompressing once — then `<file>.cdx.parquet` lands
    next to the file. File-grain parallel like the readers (the walk
    is the unavoidable one-time full decompression; every later
    point lookup is ranged). Files whose sidecar already exists are
    skipped. Returns a manifest (file, n_records, indexed) — an
    action on it performs the writes."""
    import os
    import zlib

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def kernel(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fname = fpath[len("file:"):] if str(fpath).startswith(
                    "file:") else str(fpath)
                side = fname + ".cdx.parquet"
                if os.path.exists(side):
                    out.append((fname, -1, False))
                    continue
                data = bytes(content)
                idx = []
                pos = 0
                while pos < len(data):
                    d = zlib.decompressobj(wbits=31)
                    try:
                        rec = d.decompress(data[pos:])
                    except zlib.error:
                        break
                    consumed = len(data) - pos - len(d.unused_data)
                    if consumed <= 0:
                        break
                    parsed = _parse_record_bytes(rec)
                    if parsed is not None:
                        idx.append((parsed[1], pos, consumed))
                    pos += consumed
                tbl = pa.table({
                    "target_uri": [r[0] for r in idx],
                    "offset": pa.array([r[1] for r in idx],
                                       pa.int64()),
                    "length": pa.array([r[2] for r in idx],
                                       pa.int64()),
                    "file": [fname] * len(idx),
                })
                pq.write_table(tbl, side)
                out.append((fname, len(idx), True))
            yield pd.DataFrame(
                out, columns=["file", "n_records", "indexed"])

    return files.mapInPandas(
        kernel, "file string, n_records long, indexed boolean")


def read_warc_gz_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The CDX sidecars of a `write_warc_gz` output dir as one frame:
    (target_uri, offset, length, file). Tiny relative to the data —
    filter it (by URI, prefix, host, ...) and hand the survivors to
    `fetch_warc_records` for ranged reads."""
    import os

    return spark.read.parquet(os.path.join(out_dir, "*.cdx.parquet"))


def fetch_warc_records(spark: SparkSession,
                       index_df: DataFrame) -> DataFrame:
    """Record-range reads over indexed `.warc.gz`: for each
    (file, offset, length) row, seek + read + gunzip JUST that
    member — the standard Common Crawl point-lookup pattern, never
    decompressing whole files. Selected rows shuffle once on `file`
    (one task per file's selections, seek-ordered); parallelism is
    min(files, selections), and a lookup of k records costs O(k)
    bytes read regardless of corpus size."""
    sel = index_df.select("file", "offset", "length") \
        .repartition("file")

    def kernel(batches):
        import gzip

        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, grp in pdf.groupby("file"):
                with open(fname, "rb") as fh:
                    for off, ln in sorted(
                            zip(grp["offset"], grp["length"])):
                        fh.seek(int(off))
                        rec = gzip.decompress(fh.read(int(ln)))
                        parsed = _parse_record_bytes(rec)
                        if parsed is not None:
                            rows.append(parsed)
            yield pd.DataFrame(
                rows, columns=["warc_type", "target_uri",
                               "content_length", "http_status",
                               "body", "length_ok"])

    return sel.mapInPandas(kernel, PARSED_SCHEMA)
