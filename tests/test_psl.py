"""Public-suffix-list registered-domain extraction (functions/psl.py):
the full PSL prevailing-rule algorithm (longest match, wildcard `*.`
consuming one label, `!` exception overriding a wildcard, default
rule) over the vendored snapshot, as a zero-shuffle literal-map
expression."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hummingbird_spark.functions.psl import (
    MAX_PROBE,
    PSL_RULES,
    compile_rules,
    registered_domain_psl,
)

CASES = {
    # multi-label ICANN registries
    "news.bbc.co.uk": "bbc.co.uk",
    "bbc.co.uk": "bbc.co.uk",
    "shop.example.com.au": "example.com.au",
    "a.b.example.com": "example.com",
    "example.com": "example.com",
    # private-section hosting suffixes
    "myuser.github.io": "myuser.github.io",
    "deep.myuser.github.io": "myuser.github.io",
    "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
    # wildcard TLD + the canonical exception (publicsuffix.org test
    # vector: www.www.ck -> www.ck — the exception prevails for
    # subdomains too, so the public suffix is plain 'ck')
    "x.other.ck": "x.other.ck",
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    # Japanese city wildcard/exception pair
    "x.ward.kawasaki.jp": "x.ward.kawasaki.jp",
    "sub.city.kawasaki.jp": "city.kawasaki.jp",
    # default rule (unknown TLD) and degenerate hosts
    "unknown.tld.zz": "tld.zz",
    "localhost": "localhost",
    # a host that IS a public suffix maps to itself (documented)
    "co.uk": "co.uk",
    "other.ck": "other.ck",
    "ward.kawasaki.jp": "ward.kawasaki.jp",
}


def test_registered_domain_psl_cases(spark):
    df = spark.createDataFrame([Row(h=h) for h in CASES])
    got = {r.h: r.d for r in df.select(
        "h", registered_domain_psl(F.col("h")).alias("d")).collect()}
    assert got == CASES


def test_compile_rules_shapes():
    compiled = dict((t, (w, x, e)) for t, w, x, e in compile_rules())
    # normal rule: eff = its label count
    assert compiled["co.uk"] == (0, 0, 2)
    # wildcard: match on the parent tail, eff = parent + 1
    assert compiled["ck"] == (1, 0, 2)
    assert compiled["kawasaki.jp"] == (1, 0, 3)
    # exception: eff = rule minus its leftmost label
    assert compiled["www.ck"] == (0, 1, 1)
    assert compiled["city.kawasaki.jp"] == (0, 1, 2)
    # probe depth covers the longest tail in the snapshot
    assert MAX_PROBE == max(
        t.count(".") + 1 for t, *_ in compile_rules())
    # snapshot sanity: every rule is lowercase, no blank entries
    assert all(r == r.lower() and r.strip("!*. ") for r in PSL_RULES)


def test_exception_beats_wildcard_regardless_of_length(spark):
    # city.kawasaki.jp (exception, eff 2) must prevail over
    # *.kawasaki.jp (wildcard, eff 3) for hosts under city.
    df = spark.createDataFrame([Row(h="a.b.city.kawasaki.jp")])
    row = df.select(registered_domain_psl(F.col("h")).alias("d")).head()
    assert row.d == "city.kawasaki.jp"
