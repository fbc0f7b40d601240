"""robots.txt politeness (RFC 9309): group parsing, agent selection,
most-specific-rule verdicts. The crawl-policy component between URL
canonicalization and fetching — no reference analogue (the reference
ingests live collections; SURVEY §2.1).

Path matching implements the FULL RFC 9309 pattern language: literal
prefixes, `*` (any character run, anywhere in the rule) and a
trailing `$` end-anchor. Precedence is the spec's "most specific
rule" — longest rule STRING in octets — with Allow winning
equal-length ties (the Googlebot rule). Wildcard-free rules keep the
cheap startswith path; rules containing `*`/`$` compile to an
anchored regex ONCE, host-side, and match via rlike (the regex build
rides the bounded rules frame, never the URL side). Crawl-delay is
surfaced per group, including delay-only groups (full-outer join).
All DataFrame ops — the per-host line state machine (a User-agent
line opens a new group unless the previous line was also User-agent)
is a lag + running-sum window over line numbers, partitioned by
host: robots files are capped at 500 KiB by the RFC, so a host's
partition is bounded by construction and the window can never see
scale skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(robots: DataFrame, agent: str,
                 host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> one row per effective rule for `agent`:
    (host, kind, path, crawl_delay). Group selection: the first group
    naming the agent (lowercased exact token), else the first '*'
    group, else no rows (everything allowed)."""
    w = Window.partitionBy(host_col).orderBy("pos")
    lines = (
        robots.select(
            host_col,
            F.posexplode(F.split(F.col(txt_col), "\n"))
            .alias("pos", "raw"))
        .select(
            host_col, "pos",
            F.trim(F.regexp_replace("raw", "#.*$", "")).alias("ln"))
        .filter(F.length("ln") > 0)
        .select(
            host_col, "pos",
            F.lower(F.regexp_extract("ln", r"^([A-Za-z-]+)\s*:", 1))
            .alias("kind"),
            F.trim(F.regexp_extract("ln", r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
            .alias("val"))
        .filter(F.col("kind").isin(
            "user-agent", "allow", "disallow", "crawl-delay"))
    )
    ua = F.col("kind") == "user-agent"
    flagged = lines.select(
        host_col, "pos", "kind", "val",
        (ua & ~F.coalesce(F.lag(ua).over(w), F.lit(False)))
        .cast("int").alias("__ng"),
    )
    # materialize once: the grouped-lines frame feeds three branches
    # (agents, rules, delay) — without the cut each would re-run the
    # explode + two windows; the frame is bounded (RFC 500 KiB/host)
    grouped = flagged.select(
        host_col, "pos", "kind", "val",
        F.sum("__ng").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("gid"),
    ).localCheckpoint(eager=True)
    agents = (
        grouped.filter(ua)
        .groupBy(host_col, "gid")
        .agg(F.collect_set(F.lower("val")).alias("agents"))
    )
    chosen = (
        agents.groupBy(host_col)
        .agg(
            F.min(F.when(F.array_contains("agents", agent.lower()),
                         F.col("gid"))).alias("g_exact"),
            F.min(F.when(F.array_contains("agents", "*"),
                         F.col("gid"))).alias("g_star"),
        )
        .select(host_col,
                F.coalesce("g_exact", "g_star").alias("gid"))
        .filter(F.col("gid").isNotNull())
    )
    rules = grouped.filter(~ua).join(chosen, [host_col, "gid"])
    delay = (
        rules.filter(F.col("kind") == "crawl-delay")
        .groupBy(host_col)
        .agg(F.min(F.col("val").cast("int")).alias("crawl_delay"))
    )
    path_rules = (
        rules.filter(F.col("kind").isin("allow", "disallow"))
        .filter(F.length("val") > 0)  # empty Disallow: allow-all no-op
        .select(host_col, "kind", F.col("val").alias("path"),
                _rule_pattern(F.col("val")).alias("pattern"))
    )
    # FULL outer: a chosen group may carry a Crawl-delay and no
    # (non-empty) path rules — such a host must still surface its
    # delay (as a row with null kind/path; null path can never win a
    # longest-prefix match, so verdicts see only the delay).
    # The RESULT is checkpointed too, not just the grouped-lines
    # frame: every caller evaluates it at least twice (verdicts count
    # it for the broadcast gate, then join against it; frontier ticks
    # reuse it per batch) and without the cut the group-selection
    # joins, pattern compile, and full-outer delay join re-derive on
    # each evaluation. Bounded: one row per effective rule line,
    # capped by the RFC's 500 KiB/host file limit.
    return path_rules.join(delay, host_col, "full_outer") \
        .localCheckpoint(eager=True)


def robots_sitemaps(robots: DataFrame,
                    host_col: str = "host",
                    txt_col: str = "robots_txt") -> DataFrame:
    """`Sitemap:` directives -> (host, sitemap_url). Per RFC 9309 the
    directive is host-wide (independent of any user-agent group), so
    this is a plain line scan — no group selection. The discovery
    half of the crawl loop: these URLs seed the sitemap fetches whose
    XML then feeds the frontier."""
    lines = (
        robots.select(
            host_col,
            F.explode(F.split(F.col(txt_col), "\n")).alias("raw"))
        .select(host_col,
                F.trim(F.regexp_replace("raw", "#.*$", "")).alias("ln"))
        .filter(F.lower(F.col("ln")).startswith("sitemap:"))
        .select(host_col,
                F.trim(F.expr("substring(ln, 9)")).alias("sitemap_url"))
        .filter(F.length("sitemap_url") > 0)
        .distinct()
    )
    return lines


def _rule_pattern(path: Column) -> Column:
    """RFC 9309 pattern -> anchored Java/RE2 regex, or null for
    wildcard-free rules (those keep the cheap startswith match).
    `*` matches any character run; a trailing `$` anchors the end;
    every other regex metacharacter in the rule is escaped. Compiled
    once per RULE row — the bounded side of the join."""
    has_wild = path.contains("*") | path.endswith("$")
    ends = path.endswith("$")
    body = F.when(
        ends, F.substring(path, F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    esc = F.regexp_replace(
        body, r"([\\.\+\?\(\)\[\]\{\}\^\$\|])", "\\\\$1")
    rx = F.concat(F.lit("^"), F.replace(esc, F.lit("*"), F.lit(".*")),
                  F.when(ends, F.lit("$")).otherwise(F.lit("")))
    return F.when(has_wild, rx)


def robots_verdicts(urls: DataFrame, rules: DataFrame,
                    url_col: str = "url",
                    host_col: str = "host",
                    broadcast_limit: int = 1_000_000) -> DataFrame:
    """Per URL: allowed (1/0), the matched rule path ('' if none) and
    the host's crawl_delay. RFC 9309 most-specific rule wins (longest
    rule string in octets, `*`/`$` patterns included); Allow wins
    equal-length ties. URLs on hosts without rules pass through
    allowed (the left join).

    The rules side broadcasts only while it fits (<= broadcast_limit
    rows, counted once — the rules frame sits on a localCheckpoint so
    the count is a cheap re-read): rules grow with the HOST count, so
    an unconditional hint would eventually exceed the broadcast/driver
    limit and fail the job instead of degrading to a shuffle join.
    Past the limit the hint is dropped and AQE picks the strategy."""
    from hummingbird_spark.functions.html import url_host, url_path

    u = urls.select(
        "*",
        url_host(F.col(url_col)).alias(host_col),
        url_path(F.col(url_col)).alias("__path"))
    # ONE broadcast left-join + one aggregate: the non-matching and
    # no-rules cases survive as null `best` inside the group instead
    # of being filtered into a second (sort-merge) self-join — at
    # corpus scale the URL side shuffles exactly once, on url
    if rules.count() <= broadcast_limit:
        rules = F.broadcast(rules)
    cand = u.join(rules, host_col, "left")
    # wildcard-free rules match by prefix; compiled rules by regex
    hit = F.col("path").isNotNull() & F.when(
        F.col("pattern").isNotNull(),
        F.regexp_like(F.col("__path"), F.col("pattern")),
    ).otherwise(F.col("__path").startswith(F.col("path")))
    return (
        cand.groupBy(url_col, host_col)
        .agg(
            F.max(F.when(hit, F.struct(
                F.length("path").alias("l"),
                (F.col("kind") == "allow").cast("int").alias("a"),
                F.col("path").alias("p")))).alias("best"),
            F.min("crawl_delay").alias("__delay"),
        )
        .select(
            url_col, host_col,
            F.when(F.col("best").isNull(), F.lit(1))
            .otherwise(F.col("best.a")).alias("allowed"),
            F.coalesce(F.col("best.p"), F.lit("")).alias("matched_rule"),
            F.coalesce("__delay", F.lit(0)).alias("crawl_delay"),
        )
    )
