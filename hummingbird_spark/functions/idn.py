"""Internationalized-domain-name (IDN) host normalization — the
opt-in unifier for the two on-wire spellings of the same host
(Unicode 'münchen.example' vs punycode 'xn--mnchen-3ya.example').

DEFAULT POLICY (documented in functions/html.py::canonical_url):
hosts are opaque octet strings; the Unicode and xn-- forms are
DISTINCT canonical identities. That is the right default for a
Column-expression pipeline — bootstring (RFC 3492) decoding is an
adaptive variable-length integer algorithm that has no sane
fixed-depth expression form — and it is lossless: nothing is merged
that a later pass cannot merge. Pipelines that need DNS-form
identity (a crawl frontier keying politeness on the resolved host)
run this normalizer over their host/URL column first.

Spark shape: ONE Arrow-batched mapInPandas kernel (never a
row-at-a-time Python UDF), a narrow projection riding the scan — no
shuffle at any corpus size. Batches that are pure ASCII without any
'xn--' label (the overwhelming majority of real hosts) short-circuit
on a vectorized pandas mask and never enter the per-row codec. The
codec is the stdlib's IDNA implementation; labels it rejects pass
through unchanged (documented: a malformed xn-- label keeps its
literal spelling rather than poisoning the batch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _to_ascii_host(host: str) -> str:
    """Unicode form -> punycode (DNS) form; already-ASCII hosts pass
    through. Per-label, stdlib IDNA; undecodable labels unchanged."""
    try:
        labels = host.split(".")
        out = []
        for lab in labels:
            if lab.isascii():
                out.append(lab)
            else:
                out.append(lab.encode("idna").decode("ascii"))
        return ".".join(out)
    except (UnicodeError, ValueError):
        return host


def _to_unicode_host(host: str) -> str:
    """Punycode form -> Unicode form; labels without the xn-- ACE
    prefix (and undecodable ones) pass through."""
    try:
        labels = host.split(".")
        out = []
        for lab in labels:
            if lab.lower().startswith("xn--"):
                out.append(lab.encode("ascii").decode("idna"))
            else:
                out.append(lab)
        return ".".join(out)
    except (UnicodeError, ValueError):
        return host


def normalize_idn_hosts(df: DataFrame, host_col: str,
                        out_col: str | None = None,
                        form: str = "ascii") -> DataFrame:
    """Add `out_col` (default: overwrite `host_col`) holding the
    host normalized to `form` ('ascii' = punycode/DNS form,
    'unicode' = display form). One mapInPandas projection, schema =
    input schema + the new column (or unchanged when overwriting)."""
    if form not in ("ascii", "unicode"):
        raise ValueError("form must be 'ascii' or 'unicode'")
    dst = out_col or host_col
    fn = _to_ascii_host if form == "ascii" else _to_unicode_host

    in_schema = df.schema
    names = [f.name for f in in_schema.fields]
    if dst in names:
        out_schema = in_schema
    else:
        from pyspark.sql.types import StringType, StructField, StructType

        out_schema = StructType(
            list(in_schema.fields) + [StructField(dst, StringType())])

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            col = pdf[host_col]
            # vectorized fast path: a batch slice needs the codec
            # only when non-ASCII (to-ascii) or an xn-- label
            # (to-unicode) is present
            s = col.fillna("")
            if form == "ascii":
                needs = ~s.map(str.isascii)
            else:
                needs = s.str.lower().str.contains("xn--", regex=False)
            vals = s.copy()
            if bool(needs.any()):
                vals.loc[needs] = s.loc[needs].map(fn)
            vals = vals.where(col.notna(), None)
            out = pdf.copy()
            out[dst] = vals
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(_kernel, out_schema)
