"""Public-suffix-list registered-domain extraction (eTLD+1).

`PSL_RULES` is a vendored SNAPSHOT of publicsuffix.org's public list
(the PSL format: plain suffix rules, `*.` wildcard rules matching
exactly one extra label, and `!` exception rules that override a
wildcard) covering the second-level registries, wildcard TLDs, and
hosting-platform private suffixes a crawl actually meets. Swap the
tuple for a parse of the full `public_suffix_list.dat` to go
exhaustive — the algorithm below is the complete PSL algorithm and
does not depend on which rules are present. Single-label TLD rules
are intentionally omitted: the PSL default rule `*` (public suffix =
the last label) produces identical results for them.

Matching is a PURE COLUMN EXPRESSION — a literal map keyed by rule
tail, probed with the host's last-k-label tails (k bounded by the
longest rule). No join, no shuffle, no UDF: the lookup rides
whatever scan produces the host column and works inside array
lambdas, which a broadcast-join formulation cannot. ~200 map entries
x <=4 probes per row is far below the regex work the HTML chain
already does per page.

Prevailing-rule semantics (publicsuffix.org/list/): an exception
rule always wins; otherwise the longest match; otherwise the default
rule `*`. The registered domain is the public suffix plus one label;
a host that IS a public suffix maps to itself (documented choice —
the spec says "no registrable domain"; identity keeps the column
total for rollups).

`functions/html.py::registered_domain` (PSL-lite, 7 second-level
tokens) remains for plans that predate the table; new consumers
should use `registered_domain_psl`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Snapshot subset of publicsuffix.org (ICANN + private sections).
PSL_RULES: tuple[str, ...] = (
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
    "sch.uk", "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au",
    # Japan (incl. the city wildcard/exception pairs)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "blog.br", "eco.br",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # Mexico / Argentina / Turkey
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    # Korea / Taiwan / Hong Kong
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "seoul.kr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # Singapore / Malaysia / Thailand / Indonesia
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "sch.id",
    "web.id", "my.id",
    # Israel / Poland / Ukraine / Russia regions
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "wroc.pl",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "kiev.ua",
    "com.ru", "msk.ru", "spb.ru",
    # Wildcard TLDs (+ the canonical exception)
    "*.ck", "!www.ck", "*.bd", "*.kh", "*.mm", "*.np", "*.pg",
    # Private section: hosting platforms where each tenant is a
    # registrable domain
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "wordpress.com", "herokuapp.com", "netlify.app",
    "vercel.app", "web.app", "firebaseapp.com", "appspot.com",
    "pages.dev", "workers.dev", "azurewebsites.net",
    "cloudfront.net", "s3.amazonaws.com",
)


def compile_rules(
        rules: tuple[str, ...] = PSL_RULES) -> list[tuple[str, int, int, int]]:
    """PSL rule strings -> (match_tail, wild, exc, eff_labels):
    `match_tail` is the literal host tail to probe with; `eff_labels`
    the public-suffix label count a match implies (wildcards: parent
    + the one label `*` consumes; exceptions: the rule minus its
    leftmost label)."""
    out = []
    for rule in rules:
        exc = rule.startswith("!")
        body = rule[1:] if exc else rule
        labels = body.split(".")
        if labels[0] == "*":
            out.append((".".join(labels[1:]), 1, 0, len(labels)))
        elif exc:
            out.append((body, 0, 1, len(labels) - 1))
        else:
            out.append((body, 0, 0, len(labels)))
    return out


_COMPILED = compile_rules()
# deepest probe needed: the longest match_tail's label count
MAX_PROBE = max(t.count(".") + 1 for t, *_ in _COMPILED)


def _rule_map() -> Column:
    """Literal map tail -> packed code (wild*100000 + exc*10000 +
    eff). Built per call — it is a plan literal, not per-row work."""
    flat: list[Column] = []
    for tail, wild, exc, eff in _COMPILED:
        flat.append(F.lit(tail))
        flat.append(F.lit(wild * 100000 + exc * 10000 + eff))
    return F.create_map(*flat)


def public_suffix_labels(host: Column) -> Column:
    """Label count of the host's public suffix under the snapshot
    (the PSL prevailing-rule algorithm; default rule -> 1)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    m = _rule_map()
    ks = F.sequence(F.lit(1), F.least(n, F.lit(MAX_PROBE)))
    # score per probe depth: struct(exc, eff); invalid -> (0, 0)
    scores = F.transform(
        ks,
        lambda k: _score(m, labels, n, k),
    )
    best = F.aggregate(
        scores,
        F.struct(F.lit(0).alias("exc"), F.lit(0).alias("eff")),
        lambda acc, x: F.greatest(acc, x),
    )
    return F.when(best["eff"] > 0, best["eff"]).otherwise(F.lit(1))


def _score(m: Column, labels: Column, n: Column, k: Column) -> Column:
    code = F.element_at(m, F.concat_ws(".", F.slice(labels, -k, k)))
    wild = (code >= 100000).cast("int")
    exc = ((code % 100000) >= 10000).cast("int")
    eff = code % 10000
    # a wildcard's extra label must exist within the host
    valid = code.isNotNull() & ((wild == 0) | (n >= eff))
    return F.when(
        valid, F.struct(exc.alias("exc"), eff.alias("eff"))
    ).otherwise(F.struct(F.lit(0).alias("exc"), F.lit(0).alias("eff")))


def registered_domain_psl(host: Column) -> Column:
    """eTLD+1 under the vendored PSL snapshot. A host that is itself
    a public suffix (or shorter) maps to itself."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    eff = public_suffix_labels(host)
    take = eff + F.lit(1)
    return F.when(n <= eff, host).otherwise(
        F.concat_ws(".", F.slice(labels, -take, take)))
