"""robots.txt politeness (operators/robots.py): group state machine,
agent selection, longest-prefix verdicts. The registry query's full
SQL parity rides test_oracle_parity.py; these pin the RFC 9309-subset
behaviors on crafted files."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hummingbird_spark.operators.robots import (
    robots_rules,
    robots_verdicts,
)

ROBOTS = """# sample file
User-agent: trainingbot
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 3

User-agent: *
Disallow: /
"""

STAR_ONLY = """User-agent: a
User-agent: b
Disallow: /x/

User-agent: *
Disallow: /y/
Disallow:
"""


def _rules(spark, txt, agent="trainingbot"):
    df = spark.createDataFrame([Row(host="h.example", robots_txt=txt)])
    return robots_rules(df, agent=agent)


class TestRobotsRules:
    def test_exact_group_beats_star(self, spark):
        rows = _rules(spark, ROBOTS).collect()
        assert {(r.kind, r.path) for r in rows} == {
            ("disallow", "/private/"), ("allow", "/private/ok/")}
        assert all(r.crawl_delay == 3 for r in rows)

    def test_star_fallback_and_shared_ua_lines(self, spark):
        # agent 'c' matches neither a nor b -> the '*' group; the
        # empty Disallow is an allow-all no-op and must drop
        rows = _rules(spark, STAR_ONLY, agent="c").collect()
        assert {(r.kind, r.path) for r in rows} == {("disallow", "/y/")}

    def test_shared_ua_group(self, spark):
        # consecutive UA lines share one group
        rows = _rules(spark, STAR_ONLY, agent="b").collect()
        assert {(r.kind, r.path) for r in rows} == {("disallow", "/x/")}

    def test_no_matching_group(self, spark):
        df = spark.createDataFrame(
            [Row(host="h.example",
                 robots_txt="User-agent: other\nDisallow: /")])
        assert robots_rules(df, agent="trainingbot").count() == 0


class TestRobotsVerdicts:
    def test_longest_match_and_allow_ties(self, spark):
        rules = _rules(spark, ROBOTS)
        urls = spark.createDataFrame([
            Row(url="https://h.example/private/x"),
            Row(url="https://h.example/private/ok/x"),
            Row(url="https://h.example/public/x"),
        ])
        out = {r.url: r for r in
               robots_verdicts(urls, rules).collect()}
        assert out["https://h.example/private/x"].allowed == 0
        assert out["https://h.example/private/ok/x"].allowed == 1
        assert out["https://h.example/private/ok/x"].matched_rule == \
            "/private/ok/"
        assert out["https://h.example/public/x"].allowed == 1
        assert all(r.crawl_delay == 3 for r in out.values())

    def test_host_without_rules_passes(self, spark):
        rules = _rules(spark, ROBOTS)
        urls = spark.createDataFrame(
            [Row(url="https://other.example/private/x")])
        row = robots_verdicts(urls, rules).head()
        assert row.allowed == 1 and row.crawl_delay == 0

    def test_wildcard_star_and_dollar(self, spark):
        """RFC 9309 pattern language: * matches any run, trailing $
        anchors the end, and precedence is rule-string length."""
        txt = ("User-agent: trainingbot\n"
               "Disallow: /p/*0$\n"
               "Allow: /p/*00$\n"
               "Disallow: /fish*.php\n"
               "Disallow: /x$\n")
        rules = _rules(spark, txt)
        urls = spark.createDataFrame([
            Row(url="https://h.example/p/10"),     # *0$ -> blocked
            Row(url="https://h.example/p/100"),    # *00$ beats *0$
            Row(url="https://h.example/p/105"),    # no rule matches
            Row(url="https://h.example/fishheads/catfish.php"),
            Row(url="https://h.example/fish.html"),  # .php anchor... no
            Row(url="https://h.example/x"),        # /x$ exact
            Row(url="https://h.example/xy"),       # $ stops the match
        ])
        out = {r.url: r for r in
               robots_verdicts(urls, rules).collect()}
        assert out["https://h.example/p/10"].allowed == 0
        assert out["https://h.example/p/10"].matched_rule == "/p/*0$"
        assert out["https://h.example/p/100"].allowed == 1
        assert out["https://h.example/p/100"].matched_rule == "/p/*00$"
        assert out["https://h.example/p/105"].allowed == 1
        assert out["https://h.example/fishheads/catfish.php"] \
            .allowed == 0
        # '.php' must match literally — '.' is escaped, so
        # '/fishXphp' style paths stay allowed
        assert out["https://h.example/fish.html"].allowed == 1
        assert out["https://h.example/x"].allowed == 0
        assert out["https://h.example/xy"].allowed == 1

    def test_metachars_in_literal_rules_are_escaped(self, spark):
        txt = ("User-agent: trainingbot\n"
               "Disallow: /a.b*\n")
        rules = _rules(spark, txt)
        urls = spark.createDataFrame([
            Row(url="https://h.example/a.b/c"),
            Row(url="https://h.example/aXb/c"),
        ])
        out = {r.url: r.allowed for r in
               robots_verdicts(urls, rules).collect()}
        assert out == {"https://h.example/a.b/c": 0,
                       "https://h.example/aXb/c": 1}

    def test_sitemap_directives_are_host_wide(self, spark):
        """Sitemap: lines are group-independent per RFC 9309 — they
        surface regardless of agent groups, case-insensitively, with
        comments stripped and duplicates collapsed."""
        from hummingbird_spark.operators.robots import robots_sitemaps

        txt = ("Sitemap: https://h.example/sitemap.xml\n"
               "User-agent: other\n"
               "Disallow: /\n"
               "sitemap: https://h.example/news.xml  # daily\n"
               "Sitemap: https://h.example/sitemap.xml\n")
        df = spark.createDataFrame(
            [Row(host="h.example", robots_txt=txt)])
        got = {r.sitemap_url for r in robots_sitemaps(df).collect()}
        assert got == {"https://h.example/sitemap.xml",
                       "https://h.example/news.xml"}
        # and the group machine never sees them as rules
        assert _rules(spark, txt).count() == 0

    def test_delay_only_group_keeps_its_delay(self, spark):
        """A chosen group with a Crawl-delay and NO (non-empty) path
        rules must still surface the delay (the r8 ADVICE case: the
        delay->path-rules left join silently dropped it). Everything
        stays allowed — a null path can never win a prefix match."""
        txt = "User-agent: trainingbot\nCrawl-delay: 7\n\n" \
              "User-agent: *\nDisallow: /\n"
        rules = _rules(spark, txt)
        rows = rules.collect()
        assert len(rows) == 1
        assert rows[0].kind is None and rows[0].path is None
        assert rows[0].crawl_delay == 7
        urls = spark.createDataFrame(
            [Row(url="https://h.example/anything"),
             Row(url="https://h.example/else")])
        out = robots_verdicts(urls, rules).collect()
        assert all(r.allowed == 1 and r.crawl_delay == 7
                   and r.matched_rule == "" for r in out)
