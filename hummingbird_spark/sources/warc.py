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

Simplification vs full ISO 28500 (documented contract): the parser
assumes text payloads that do not themselves contain the bare record
magic; binary payloads need the offset-based reader (Content-Length
arithmetic), which this seam is shaped to grow into.
"""

from __future__ import annotations

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
    headers, HTTP status line + headers, body."""
    parts = F.split(rec, CRLF + CRLF)
    warc_hdr = F.element_at(parts, 1)
    http_hdr = F.element_at(parts, 2)
    body = F.when(F.size(parts) >= 3, F.element_at(parts, 3)) \
        .otherwise(F.lit(""))
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
    a custom lineSep — no whole-file strings, splittable scans."""
    raw = spark.read.option("lineSep", RECORD_MAGIC).text(path)
    recs = raw.filter(F.length(F.trim(F.col("value"))) > 0)
    return recs.select(*_parse_record(F.col("value")))
