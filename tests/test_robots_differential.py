"""Differential test: operators/robots.py vs the stdlib reference
implementation (urllib.robotparser) on randomly generated robots
files and URLs.

Scope note (why the generator shapes rules the way it does): the
stdlib parser resolves overlapping rules FIRST-match, while this repo
implements RFC 9309 / Googlebot LONGEST-match — the two agree exactly
when no rule path is a prefix of another, so the generator emits
same-depth distinct-segment prefixes ('/segN/'), where the trailing
slash guarantees non-overlap. Group selection, '*' fallback, shared
User-agent lines, comments, blank lines, and crawl-delay have
identical semantics in both and are exercised freely."""

from __future__ import annotations

import random
import urllib.robotparser as urp

from pyspark.sql import Row

from hummingbird_spark.operators.robots import (
    robots_rules,
    robots_verdicts,
)

AGENT = "trainingbot"


def _gen_host(rng, h):
    """One random robots file + its URL probes."""
    segs = rng.sample([f"seg{i}" for i in range(8)], 6)
    lines = [f"# host {h}"]
    delay = None
    if rng.random() < 0.7:  # agent-specific group
        lines.append(f"User-agent: {AGENT}")
        for s in segs[:2]:
            lines.append(
                f"{'Allow' if rng.random() < 0.3 else 'Disallow'}"
                f": /{s}/")
        if rng.random() < 0.5:
            delay = rng.randint(1, 9)
            lines.append(f"Crawl-delay: {delay}")
        lines.append("")
    if rng.random() < 0.8:  # star group
        lines.append("User-agent: *")
        for s in segs[2:4]:
            lines.append(f"Disallow: /{s}/")
    urls = [f"https://h{h}.example/{s}/page" for s in segs] + [
        f"https://h{h}.example/unruled/page"]
    return "\n".join(lines), urls


def test_verdicts_match_stdlib_robotparser(spark):
    rng = random.Random(3629)
    robots_rows, url_rows, parsers = [], [], {}
    for h in range(12):
        txt, urls = _gen_host(rng, h)
        host = f"h{h}.example"
        robots_rows.append(Row(host=host, robots_txt=txt))
        url_rows += [Row(url=u) for u in urls]
        p = urp.RobotFileParser()
        p.parse(txt.splitlines())
        parsers[host] = p

    rules = robots_rules(
        spark.createDataFrame(robots_rows), agent=AGENT)
    out = robots_verdicts(spark.createDataFrame(url_rows), rules)
    for r in out.collect():
        p = parsers[r.host]
        want = p.can_fetch(AGENT, r.url)
        assert bool(r.allowed) == want, \
            f"{r.url}: spark={bool(r.allowed)} stdlib={want}"
        want_delay = p.crawl_delay(AGENT) or 0
        assert r.crawl_delay == want_delay, \
            f"{r.url}: delay spark={r.crawl_delay} stdlib={want_delay}"
