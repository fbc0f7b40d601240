"""IDN host normalization (functions/idn.py) and the documented
default: canonical_url treats the Unicode and punycode spellings of
one host as distinct identities; normalize_idn_hosts is the opt-in
unifier for pipelines that key on the DNS form."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hummingbird_spark.functions.html import canonical_url, url_host
from hummingbird_spark.functions.idn import (
    _to_ascii_host,
    _to_unicode_host,
    normalize_idn_hosts,
)

VECTORS = [
    ("münchen.example", "xn--mnchen-3ya.example"),
    ("bücher.example", "xn--bcher-kva.example"),
    ("日本.example", "xn--wgv71a.example"),
    ("plain.example", "plain.example"),
]


def test_label_codec_roundtrip():
    for uni, ace in VECTORS:
        assert _to_ascii_host(uni) == ace
        assert _to_unicode_host(ace) == uni
    # mixed-label host: only the non-ASCII label converts
    assert _to_ascii_host("www.münchen.example") == \
        "www.xn--mnchen-3ya.example"
    # malformed ACE label passes through instead of raising
    assert _to_unicode_host("xn--zzzzzz!!.example") == \
        "xn--zzzzzz!!.example"


def test_normalize_idn_hosts_both_forms(spark):
    df = spark.createDataFrame(
        [Row(host=u) for u, _ in VECTORS]
        + [Row(host=a) for _, a in VECTORS] + [Row(host=None)])
    asc = {r.host: r.h for r in normalize_idn_hosts(
        df, "host", out_col="h", form="ascii").collect()}
    for uni, ace in VECTORS:
        assert asc[uni] == ace
        assert asc[ace] == ace  # already-DNS form is a fixpoint
    assert asc[None] is None
    uni_out = {r.host: r.h for r in normalize_idn_hosts(
        df, "host", out_col="h", form="unicode").collect()}
    for uni, ace in VECTORS:
        assert uni_out[ace] == uni
        assert uni_out[uni] == uni


def test_normalize_overwrites_in_place(spark):
    df = spark.createDataFrame([Row(host="münchen.example", k=1)])
    out = normalize_idn_hosts(df, "host")
    assert out.columns == ["host", "k"]
    assert out.head().host == "xn--mnchen-3ya.example"


def test_canonical_url_keeps_idn_forms_distinct(spark):
    """The documented DEFAULT: the two spellings are two canonical
    identities — merging them is the normalizer's job, by intent."""
    rows = spark.createDataFrame([
        Row(u="https://münchen.example/p"),
        Row(u="https://xn--mnchen-3ya.example/p"),
    ]).select(canonical_url(F.col("u")).alias("c"),
              url_host(F.col("u")).alias("h")).collect()
    assert rows[0].c != rows[1].c
    assert rows[0].h != rows[1].h
    # and the opt-in path DOES unify them
    df = spark.createDataFrame([
        Row(u="https://münchen.example/p"),
        Row(u="https://xn--mnchen-3ya.example/p"),
    ]).select(url_host(F.col("u")).alias("host"))
    uni = normalize_idn_hosts(df, "host", form="ascii")
    assert uni.distinct().count() == 1
