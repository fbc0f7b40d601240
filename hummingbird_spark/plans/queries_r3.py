"""Round-3 query additions: distribution analytics (deciles, bands,
seasonality, sessionization), supply-chain service rates, and deeper
training-data pipeline probes (PII scrub coverage, fingerprint
uniformity, outlier docs, shingle uniqueness, quality mixture, LSH
bucket skew, embedding norms, ANN recall).

Every SQL-expressible query carries a DuckDB oracle built on the same
md5/round-6 portability conventions as queries_text.py. Determinism
discipline: every window/limit has a total order (explicit tiebreak
keys), so Spark and the oracle rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hummingbird_spark.functions.text import (
    quality_score,
    redact_pii,
    fingerprint,
    tokens,
)
from hummingbird_spark.operators.dedup import (
    MINHASH_P,
    minhash_coefficients,
    minhash_signature_df,
)
from hummingbird_spark.operators.similarity import (
    _norm,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from hummingbird_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Distribution analytics
# ---------------------------------------------------------------------------

def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value deciles (ntile) with per-decile stats. The global
    ntile is a total sort — the exact-quantile operator class; at
    100 TB the approx path is percentile_approx bounds + a range join
    (see q_percentiles for the exact-percentile variant)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(F.ntile(10).over(w).alias("decile"), "o_totalprice")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("decile")
    )


ORACLE_DECILE_STATS = """
SELECT decile, COUNT(*) AS n_orders,
       round(MIN(o_totalprice), 2) AS min_price,
       round(MAX(o_totalprice), 2) AS max_price,
       round(AVG(o_totalprice), 4) AS avg_price
FROM (SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders)
GROUP BY decile ORDER BY decile
"""


def q_first_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between each customer's first and second order, rolled up
    by market segment — repeat-purchase latency. Broadcast customer dim
    onto the per-customer aggregate (small side after the window)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 2)
    per_cust = (
        ranked.groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("o_orderdate")))
            .alias("d1"),
            F.min(F.when(F.col("rn") == 2, F.col("o_orderdate")))
            .alias("d2"),
        )
        .filter(F.col("d2").isNotNull())
        .select("o_custkey", F.datediff("d2", "d1").alias("gap_days"))
    )
    return (
        per_cust.join(F.broadcast(c),
                      per_cust.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_repeat_customers"),
            F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_FIRST_ORDER_GAP = """
WITH ranked AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
), per_cust AS (
  SELECT o_custkey,
         MIN(CASE WHEN rn = 1 THEN o_orderdate END) AS d1,
         MIN(CASE WHEN rn = 2 THEN o_orderdate END) AS d2
  FROM ranked WHERE rn <= 2 GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
       round(AVG(date_diff('day', CAST(d1 AS DATE), CAST(d2 AS DATE))), 4)
         AS avg_gap_days,
       CAST(MAX(date_diff('day', CAST(d1 AS DATE), CAST(d2 AS DATE)))
         AS INT) AS max_gap_days
FROM per_cust JOIN customer ON o_custkey = c_custkey
WHERE d2 IS NOT NULL
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_order_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed price bands with order share — CASE banding instead of
    log10 so band edges can't straddle float rounding across engines.
    The share window runs over the 4-row aggregate, not the fact
    table."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1_000, "p0_under_1k")
        .when(F.col("o_totalprice") < 10_000, "p1_1k_10k")
        .when(F.col("o_totalprice") < 100_000, "p2_10k_100k")
        .otherwise("p3_over_100k")
    )
    agg = (
        o.select(band.alias("band"), "o_totalprice")
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    total = Window.partitionBy()
    return agg.select(
        "band", "n_orders", "revenue",
        F.round(F.col("n_orders") / F.sum("n_orders").over(total), 6)
        .alias("order_share"),
    ).orderBy("band")


ORACLE_ORDER_PRICE_BANDS = """
WITH agg AS (
  SELECT CASE WHEN o_totalprice < 1000 THEN 'p0_under_1k'
              WHEN o_totalprice < 10000 THEN 'p1_1k_10k'
              WHEN o_totalprice < 100000 THEN 'p2_10k_100k'
              ELSE 'p3_over_100k' END AS band,
         COUNT(*) AS n_orders,
         round(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY band
)
SELECT band, n_orders, revenue,
       round(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER (), 6)
         AS order_share
FROM agg ORDER BY band
"""


def q_supplier_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier on-time fill rate (shipped within 30 days of order
    date), top 25 by line volume. lineitem⋈orders shuffles on orderkey;
    the supplier dim broadcasts onto the tiny per-supplier aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_suppkey",
            (F.datediff("l_shipdate", "o_orderdate") <= 30)
            .cast("int").alias("on_time"),
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.sum("on_time").alias("n_on_time"))
    )
    return (
        per_supp.join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", "n_lines",
            F.round(F.col("n_on_time") / F.col("n_lines"), 6)
            .alias("on_time_rate"),
        )
        .orderBy(F.desc("n_lines"), "s_suppkey")
        .limit(25)
    )


ORACLE_SUPPLIER_FILL_RATE = """
WITH per_supp AS (
  SELECT l_suppkey, COUNT(*) AS n_lines,
         SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) <= 30
                  THEN 1 ELSE 0 END) AS n_on_time
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_lines,
       round(CAST(n_on_time AS DOUBLE) / n_lines, 6) AS on_time_rate
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_lines DESC, s_suppkey LIMIT 25
"""


def q_order_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders by calendar month with each month's share of total
    revenue — the seasonality profile. Share window runs over the
    12-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    agg = (
        o.groupBy(F.month("o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
             F.sum("o_totalprice").alias("__rev"))
    )
    total = Window.partitionBy()
    return agg.select(
        "month", "n_orders", "avg_price",
        F.round(F.col("__rev") / F.sum("__rev").over(total), 6)
        .alias("revenue_share"),
    ).orderBy("month")


ORACLE_ORDER_SEASONALITY = """
WITH agg AS (
  SELECT CAST(month(o_orderdate) AS INT) AS month, COUNT(*) AS n_orders,
         round(AVG(o_totalprice), 4) AS avg_price,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY month
)
SELECT month, n_orders, avg_price,
       round(rev / SUM(rev) OVER (), 6) AS revenue_share
FROM agg ORDER BY month
"""


def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity closes a session)
    returning the 20 busiest sessions. The lag/cumsum windows partition
    by user — the shuffle key — and microsecond arithmetic keeps the
    gap comparison integer-exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ (parquet nanos source); unix_micros
    # wants TIMESTAMP — the cast is identity in the UTC session tz
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    marked = ev.select(
        "user_id", "ts", "event_id",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0).alias("new_sess"),
    )
    sess = marked.select(
        "user_id", "ts",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_idx"),
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
        )
        .orderBy(F.desc("n_events"), "user_id", "session_idx")
        .limit(20)
    )


ORACLE_EVENTS_SESSIONIZED = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM marked
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM sess GROUP BY user_id, session_idx
ORDER BY n_events DESC, user_id, session_idx LIMIT 20
"""


def q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by event volume — the activity leaderboard
    (TakeOrdered over a keyed aggregate; no global sort materializes)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )


ORACLE_TOP_USERS = """
SELECT user_id, COUNT(*) AS n_events,
       round(SUM(value), 4) AS total_value
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# Text / training-data probes
# ---------------------------------------------------------------------------

def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-redaction coverage per source: how many docs the scrubber
    (functions.text.redact_pii — pure regexp projection, rides the
    scan) actually changes."""
    d = load_table(spark, sf_dir, "documents")
    changed = (redact_pii(F.col("text")) != F.col("text")).cast("int")
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(changed).alias("n_redacted"))
        .select(
            "source", "n_docs", "n_redacted",
            F.round(F.col("n_redacted") / F.col("n_docs"), 6)
            .alias("redacted_rate"),
        )
        .orderBy("source")
    )


ORACLE_DOC_PII_SCRUB = r"""
WITH scrubbed AS (
  SELECT source,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
      '\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b', '<CC>', 'g'),
      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      '\+?\d{1,2}[\s.-]?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}', '<PHONE>', 'g'),
      'https?://[^\s]+', '<URL>', 'g') AS red,
    text
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN red <> text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redacted,
       round(CAST(SUM(CASE WHEN red <> text THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS redacted_rate
FROM scrubbed GROUP BY source ORDER BY source
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-space uniformity: docs and distinct fingerprints per
    leading hex nibble — a cheap balance probe for any downstream
    hash-partitioning of the dedup key."""
    d = load_table(spark, sf_dir, "documents")
    f = fingerprint(F.col("text"))
    return (
        d.select(F.substring(f, 1, 1).alias("nibble"), f.alias("f"))
        .groupBy("nibble")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("f").alias("n_distinct"))
        .orderBy("nibble")
    )


ORACLE_DOC_FINGERPRINT = r"""
WITH fp AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
  FROM documents
)
SELECT substr(f, 1, 1) AS nibble, COUNT(*) AS n_docs,
       COUNT(DISTINCT f) AS n_distinct
FROM fp GROUP BY nibble ORDER BY nibble
"""


def q_doc_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length outliers per source: docs whose n_chars sits more than
    2 sample-stddevs from their source's mean. Windowed moments over
    the source partition — one shuffle, no self-join."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    mu = F.avg("n_chars").over(w)
    sd = F.stddev_samp("n_chars").over(w)
    z = (F.col("n_chars") - mu) / sd
    return (
        d.select("doc_id", "source", "n_chars", z.alias("__z"))
        .filter(F.abs(F.col("__z")) > 2.0)
        .select("doc_id", "source", "n_chars",
                F.round("__z", 4).alias("z_score"))
        .orderBy("doc_id")
    )


ORACLE_DOC_OUTLIERS = """
WITH z AS (
  SELECT doc_id, source, n_chars,
         (n_chars - AVG(n_chars) OVER (PARTITION BY source))
           / stddev_samp(n_chars) OVER (PARTITION BY source) AS zv
  FROM documents
)
SELECT doc_id, source, n_chars, round(zv, 4) AS z_score
FROM z WHERE abs(zv) > 2.0 ORDER BY doc_id
"""


def q_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle uniqueness per language: distinct 3-gram shingles over
    total shingle positions — near-1 means novel text, low means
    internal repetition. Shares the exact shingle construction of the
    MinHash pipeline (so this doubles as its diagnostics query)."""
    d = load_table(spark, sf_dir, "documents")
    ws = tokens(F.col("text"))
    based = d.select("lang", ws.alias("__ws")).filter(F.size("__ws") >= 3)
    idx = F.sequence(F.lit(0), F.size("__ws") - 3)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at("__ws", (i + 1).cast("int")),
            F.element_at("__ws", (i + 2).cast("int")),
            F.element_at("__ws", (i + 3).cast("int")),
        ),
    )
    ratio = (
        F.size(F.array_distinct(grams)).cast("double")
        / (F.size("__ws") - 2).cast("double")
    )
    return (
        based.select("lang", ratio.alias("__r"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("__r"), 6).alias("avg_uniqueness"))
        .orderBy("lang")
    )


ORACLE_SHINGLE_STATS = r"""
WITH words AS (
  SELECT lang, string_split_regex(trim(text), '\s+') AS ws
  FROM documents WHERE length(trim(text)) > 0
), sh AS (
  SELECT lang,
         CAST(len(list_distinct(list_transform(range(1, len(ws) - 1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS DOUBLE)
           / (len(ws) - 2) AS r
  FROM words WHERE len(ws) >= 3
)
SELECT lang, COUNT(*) AS n_docs, round(AVG(r), 6) AS avg_uniqueness
FROM sh GROUP BY lang ORDER BY lang
"""


def q_quality_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampling-mixture table: doc counts and within-language share
    per (lang, quality quintile) — what a data-mixing stage consumes as
    weights. The share window runs over the tiny aggregate."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(quality_score(F.col("text")) * 5).cast("int"), F.lit(4)
    )
    agg = (
        d.select("lang", bucket.alias("q_bucket"))
        .groupBy("lang", "q_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return agg.select(
        "lang", "q_bucket", "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6)
        .alias("share_in_lang"),
    ).orderBy("lang", "q_bucket")


ORACLE_QUALITY_MIXTURE = r"""
WITH t AS (
  SELECT doc_id, lang, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
), c AS (
  SELECT doc_id, lang,
         CAST(len(ws) AS DOUBLE) AS n_tok,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
         CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(len(list_filter(ws, w -> lower(w) IN
                   ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE)
                   / CAST(len(ws) AS DOUBLE) END AS stop_ratio,
         CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                   / CAST(len(ws) AS DOUBLE) END AS wl
  FROM t
), q AS (
  SELECT lang,
         least(CAST(floor(round(0.4 * alpha_ratio
               + 0.2 * least(stop_ratio * 5.0, 1.0)
               + 0.2 * (CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.0 END)
               + 0.2 * least(n_tok / 50.0, 1.0), 6) * 5) AS INT), 4)
           AS q_bucket
  FROM c
), agg AS (
  SELECT lang, q_bucket, COUNT(*) AS n_docs FROM q GROUP BY lang, q_bucket
)
SELECT lang, q_bucket, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / SUM(n_docs) OVER (PARTITION BY lang), 6) AS share_in_lang
FROM agg ORDER BY lang, q_bucket
"""


# same constants as operators.dedup / queries_text.ORACLE_MINHASH
_R3_COEFFS = minhash_coefficients(16)
_R3_HASH_MINS = ",\n         ".join(
    f"min((({a} * v) + {b}) % {MINHASH_P}) AS m{i}"
    for i, (a, b) in enumerate(_R3_COEFFS)
)
_R3_SIG_LIST = ", ".join(f"m{i}" for i in range(16))


def q_minhash_signature_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket skew probe: per band, how many buckets exist,
    the largest bucket, and the candidate-pair volume Σ n·(n−1)/2 each
    band would emit — the number that decides whether the band-join is
    safe or needs the max_bucket_size guard. Reuses the production
    signature pipeline (one md5 per shingle, k codegen'd minima)."""
    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signature_df(d, num_hashes=16)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        *[F.element_at("__sig", b * 4 + r + 1)
                          for r in range(4)],
                    ).alias("bkey"),
                )
                for b in range(4)
            ])
        ).alias("bb"),
    ).select("bb.band", "bb.bkey")
    sizes = banded.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        sizes.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket_size"),
            F.sum(
                (F.col("sz") * (F.col("sz") - 1) / 2).cast("long")
            ).alias("n_candidate_pairs"),
        )
        .orderBy("band")
    )


ORACLE_MINHASH_PROBE = rf"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents WHERE length(trim(text)) > 0
), shingles AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM words WHERE len(ws) >= 3
), ex AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT % {MINHASH_P} AS v
  FROM shingles
), sigv AS (
  SELECT doc_id,
         {_R3_HASH_MINS}
  FROM ex GROUP BY doc_id
), sigl AS (
  SELECT doc_id, [{_R3_SIG_LIST}] AS sig FROM sigv
), banded AS (
  SELECT CAST(bands.band AS INT) AS band,
         CAST(sig[bands.band*4+1] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+2] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+3] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+4] AS VARCHAR) AS bkey
  FROM sigl CROSS JOIN (SELECT unnest(range(4)) AS band) bands
), sizes AS (
  SELECT band, bkey, COUNT(*) AS sz FROM banded GROUP BY band, bkey
)
SELECT band, COUNT(*) AS n_buckets, MAX(sz) AS max_bucket_size,
       CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS n_candidate_pairs
FROM sizes GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# Embedding probes
# ---------------------------------------------------------------------------

def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding corpus — the sanity
    check before any cosine pipeline (un-normalized or degenerate
    clusters show up here first). Pure Column fold, JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    n = _norm(F.col("embedding"))
    return (
        e.select("label", n.alias("__n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("__n"), 6).alias("avg_norm"),
            F.round(F.min("__n"), 6).alias("min_norm"),
            F.round(F.max("__n"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_NORMS = """
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       round(AVG(nv), 6) AS avg_norm,
       round(MIN(nv), 6) AS min_norm,
       round(MAX(nv), 6) AS max_norm
FROM n GROUP BY label ORDER BY label
"""


def q_ivf_recall_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the two ANN paths against the exact top-k for the
    fixed probe vector — the quality metric that justifies trusting the
    partition-pruned scan at 100 TB. Deterministic (seeded planes and
    centroids) but not SQL-expressible: rows-only by design."""
    from hummingbird_spark.plans.queries_text import _query_vec

    e = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    exact = cosine_topk(e, qv, k=10).select("vec_id")
    approx = {
        "lsh": lsh_topk(e, qv, k=10, n_planes=8, probe_hamming=2)
        .select("vec_id"),
        "ivf": ivf_topk(e, qv, k=10, n_centroids=16, nprobe=6)
        .select("vec_id"),
    }
    parts = [
        exact.join(df, "vec_id", "semi").agg(
            F.lit(name).alias("method"),
            (F.count(F.lit(1)) / 10.0).alias("recall_at_10"),
        )
        for name, df in approx.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("method")


R3_QUERIES: dict[str, tuple] = {
    "decile_stats": (q_decile_stats, ORACLE_DECILE_STATS,
                     "ntile deciles over order value"),
    "first_order_gap": (q_first_order_gap, ORACLE_FIRST_ORDER_GAP,
                        "repeat-purchase latency by segment"),
    "order_price_bands": (q_order_price_bands, ORACLE_ORDER_PRICE_BANDS,
                          "fixed price bands with order share"),
    "supplier_fill_rate": (q_supplier_fill_rate, ORACLE_SUPPLIER_FILL_RATE,
                           "on-time fill rate per supplier (top 25)"),
    "order_seasonality": (q_order_seasonality, ORACLE_ORDER_SEASONALITY,
                          "monthly order/revenue seasonality"),
    "events_sessionized": (q_events_sessionized, ORACLE_EVENTS_SESSIONIZED,
                           "gap-based sessionization, busiest sessions"),
    "top_users": (q_top_users, ORACLE_TOP_USERS,
                  "top-20 users by event volume"),
    "doc_pii_scrub": (q_doc_pii_scrub, ORACLE_DOC_PII_SCRUB,
                      "PII redaction coverage per source"),
    "doc_fingerprint": (q_doc_fingerprint, ORACLE_DOC_FINGERPRINT,
                        "fingerprint-space uniformity probe"),
    "doc_outliers": (q_doc_outliers, ORACLE_DOC_OUTLIERS,
                     "length z-score outliers per source"),
    "shingle_stats": (q_shingle_stats, ORACLE_SHINGLE_STATS,
                      "3-gram shingle uniqueness per language"),
    "quality_mixture": (q_quality_mixture, ORACLE_QUALITY_MIXTURE,
                        "(lang, quality-quintile) sampling mixture"),
    "minhash_signature_probe": (q_minhash_signature_probe,
                                ORACLE_MINHASH_PROBE,
                                "LSH band-bucket skew probe"),
    "embedding_norms": (q_embedding_norms, ORACLE_EMBEDDING_NORMS,
                        "per-label embedding norm profile"),
    "ivf_recall_probe": (q_ivf_recall_probe, None,
                         "ANN recall@10 vs exact (rows-only)"),
}


# ---------------------------------------------------------------------------
# Pipeline-translator coverage: round-3 stages through the driver gate
# ---------------------------------------------------------------------------

def q_pipeline_window_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$setWindowFields through the translator: per-customer running
    spend + document number, keeping each customer's first 3 orders.
    Proves the stage against a plain-SQL window oracle."""
    from hummingbird_spark.pipeline import mongo_pipeline_to_df

    o = load_table(spark, sf_dir, "orders")
    out = mongo_pipeline_to_df(o, [
        {"$setWindowFields": {
            "partitionBy": "$o_custkey",
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {
                "running_spend": {"$sum": "$o_totalprice",
                                  "window": {"documents": ["unbounded",
                                                           "current"]}},
                "order_no": {"$documentNumber": {}},
            },
        }},
        {"$match": {"order_no": {"$lte": 3}}},
    ])
    return out.select(
        "o_orderkey", "o_custkey", "order_no",
        F.round("running_spend", 4).alias("running_spend"),
    )


ORACLE_PIPELINE_WINDOW_FIELDS = """
WITH w AS (
  SELECT o_orderkey, o_custkey,
         SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS running,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS order_no
  FROM orders
)
SELECT o_orderkey, o_custkey, CAST(order_no AS BIGINT) AS order_no,
       round(running, 4) AS running_spend
FROM w WHERE order_no <= 3
"""


def q_pipeline_densify_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$densify + $fill through the translator: per-day event counts on
    a gap-free day grid, generated rows filled with 0 — the canonical
    time-grid preparation for downstream window math."""
    from hummingbird_spark.pipeline import mongo_pipeline_to_df

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = mongo_pipeline_to_df(daily, [
        {"$densify": {"field": "day", "range": {"step": 1,
                                                "bounds": "full"}}},
        {"$fill": {"output": {"n_events": {"value": 0}}}},
    ])
    return out.select(
        F.col("day").cast("int").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy("day")


ORACLE_PIPELINE_DENSIFY_FILL = """
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         COUNT(*) AS n
  FROM events GROUP BY day
), b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
g AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b)
SELECT CAST(g.day AS INT) AS day,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
FROM g LEFT JOIN d ON g.day = d.day
ORDER BY day
"""


R3_QUERIES["pipeline_window_fields"] = (
    q_pipeline_window_fields, ORACLE_PIPELINE_WINDOW_FIELDS,
    "$setWindowFields translator vs SQL window oracle")
R3_QUERIES["pipeline_densify_fill"] = (
    q_pipeline_densify_fill, ORACLE_PIPELINE_DENSIFY_FILL,
    "$densify+$fill translator vs generate-series oracle")


def q_pipeline_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation expression language through the translator:
    $addFields computes net revenue ($multiply/$subtract/$round) and a
    $cond class, $group keys on the computed pair with a computed $sum
    — the everyday Mongo analytics pipeline shape. The struct _id is
    flattened for the hash harness."""
    from hummingbird_spark.pipeline import mongo_pipeline_to_df

    # decimal inputs so the computed $sum is order-independent (the
    # float fold differs between engines at cents magnitude; same
    # discipline as pricing_summary)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity",
        F.col("l_extendedprice").cast("decimal(18,2)")
        .alias("l_extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("l_discount"),
    )
    out = mongo_pipeline_to_df(li, [
        {"$addFields": {
            "net": {"$round": [{"$multiply": [
                "$l_extendedprice",
                {"$subtract": [1, "$l_discount"]}]}, 2]},
            "cls": {"$cond": {"if": {"$gte": ["$l_quantity", 30]},
                              "then": "heavy", "else": "light"}},
        }},
        {"$group": {"_id": {"flag": "$l_returnflag", "cls": "$cls"},
                    "n": {"$sum": 1},
                    "net_sum": {"$sum": "$net"}}},
    ])
    return out.select(
        F.col("_id.flag").alias("flag"), F.col("_id.cls").alias("cls"),
        "n",
        F.round("net_sum", 2).cast("double").alias("net_sum"),
    ).orderBy("flag", "cls")


ORACLE_PIPELINE_EXPRESSIONS = """
WITH t AS (
  SELECT l_returnflag AS flag,
         CASE WHEN l_quantity >= 30 THEN 'heavy' ELSE 'light' END AS cls,
         round(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS net
  FROM lineitem
)
SELECT flag, cls, COUNT(*) AS n,
       CAST(round(SUM(net), 2) AS DOUBLE) AS net_sum
FROM t GROUP BY flag, cls ORDER BY flag, cls
"""


R3_QUERIES["pipeline_expressions"] = (
    q_pipeline_expressions, ORACLE_PIPELINE_EXPRESSIONS,
    "Mongo expression language ($multiply/$cond/$round) vs SQL oracle")


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM training chunking: overlapping 50-token windows, stride 40.
    Emits per-chunk rows (JVM-side slice/concat — the chunker rides the
    scan); the oracle reproduces the span arithmetic in SQL."""
    from hummingbird_spark.functions.text import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, max_tokens=50, stride=40) \
        .orderBy("doc_id", "chunk_id")


ORACLE_DOC_CHUNKS = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
), spans AS (
  SELECT doc_id, ws, len(ws) AS n,
         CASE WHEN len(ws) <= 0 THEN 0
              ELSE CAST(ceil(greatest(len(ws) - 50, 0) / 40.0) AS INT)
                   + 1 END AS n_chunks
  FROM t
), ex AS (
  SELECT doc_id, ws, n,
         CAST(unnest(range(n_chunks)) AS INT) AS chunk_id
  FROM spans WHERE n_chunks > 0
)
SELECT doc_id, chunk_id,
       array_to_string(ws[chunk_id * 40 + 1 :
                          least(chunk_id * 40 + 50, n)], ' ')
         AS chunk_text,
       least(chunk_id * 40 + 50, n) - chunk_id * 40 AS n_tokens
FROM ex
ORDER BY doc_id, chunk_id
"""


R3_QUERIES["doc_chunks"] = (
    q_doc_chunks, ORACLE_DOC_CHUNKS,
    "LM chunking: overlapping token windows per doc")


def q_keep_newest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention operator's kernel under the correctness gate:
    exact global newest-500 by (o_orderdate, o_orderkey) computed with
    range partitioning + per-partition ranks + broadcast offsets
    (operators/retention.py::keep_newest — no single-partition window,
    no driver TakeOrdered), against a plain ORDER BY ... LIMIT oracle.

    keep_newest orders by ONE column; a composite (date, key) order
    rides a packed struct-free surrogate: date days * 2^32 + orderkey
    (both positive, orderkey < 2^32 at any SF here)."""
    from hummingbird_spark.operators.retention import keep_newest

    o = load_table(spark, sf_dir, "orders")
    surrogate = (
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long") * F.lit(4294967296).cast("long")
        + F.col("o_orderkey")
    )
    kept = keep_newest(o.withColumn("__ord", surrogate), "__ord", 500)
    return kept.select("o_orderkey", "o_custkey", "o_orderdate") \
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))


ORACLE_KEEP_NEWEST = """
SELECT o_orderkey, o_custkey, o_orderdate
FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT 500
"""


R3_QUERIES["keep_newest_orders"] = (
    q_keep_newest_orders, ORACLE_KEEP_NEWEST,
    "distributed keep-newest vs ORDER BY LIMIT oracle")


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler under the gate (exact distinct for the oracle;
    min/max excluded — engine string formats differ for doubles)."""
    from hummingbird_spark.operators.profile import profile_table

    o = load_table(spark, sf_dir, "orders")
    return profile_table(
        o, exact_distinct=True, include_minmax=False
    ).select("column", "n_rows", "n_null", "n_distinct") \
        .orderBy("column")


ORACLE_PROFILE_ORDERS = """
WITH n AS (SELECT COUNT(*) AS c FROM orders)
SELECT col AS column, n.c AS n_rows, n_null, n_distinct
FROM (
  SELECT 'o_orderkey' AS col,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
  FROM orders
  UNION ALL SELECT 'o_custkey',
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
  UNION ALL SELECT 'o_orderstatus',
         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
  UNION ALL SELECT 'o_totalprice',
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
  UNION ALL SELECT 'o_orderdate',
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
  UNION ALL SELECT 'o_orderpriority',
         CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
) s CROSS JOIN n
ORDER BY col
"""


R3_QUERIES["profile_orders"] = (
    q_profile_orders, ORACLE_PROFILE_ORDERS,
    "one-scan column profiler (exact distinct) vs per-column oracle")


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination under the gate: docs sharing 5-gram
    shingles with a synthetic "eval set" (every 97th doc). The planted
    overlap is exact-duplicate docs in the fixture plus the eval docs
    themselves; the oracle reproduces the shingle join in SQL."""
    from hummingbird_spark.operators.decontaminate import (
        contamination_report,
    )

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return contamination_report(d, bench, ngram=5) \
        .select("doc_id", "n_hits", "n_grams", "hit_ratio")


ORACLE_DECONTAMINATION = r"""
WITH grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ws) - 3),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                  || ws[i+3] || ' ' || ws[i+4]))) AS g
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE length(trim(text)) > 0)
  WHERE len(ws) >= 5
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
), hits AS (
  SELECT grams.doc_id, COUNT(*) AS n_hits
  FROM grams JOIN bench ON grams.g = bench.g
  GROUP BY grams.doc_id
)
SELECT hits.doc_id, n_hits, n_grams,
       round(CAST(n_hits AS DOUBLE) / n_grams, 6) AS hit_ratio
FROM hits JOIN sizes ON hits.doc_id = sizes.doc_id
ORDER BY hits.doc_id
"""


R3_QUERIES["decontamination"] = (
    q_decontamination, ORACLE_DECONTAMINATION,
    "benchmark n-gram contamination report vs SQL oracle")


def q_c4_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style curation flags rolled up per source: keep rate and the
    line statistics driving each rule (flags ride the scan; one
    shuffle for the rollup)."""
    from hummingbird_spark.functions.text import c4_quality_flags

    d = load_table(spark, sf_dir, "documents")
    q = d.select("source", c4_quality_flags(F.col("text")).alias("q"))
    return (
        q.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("q.keep").cast("long")).alias("n_keep"),
            F.round(F.avg("q.mean_line_len"), 4).alias("avg_line_len"),
            F.round(F.avg("q.terminal_punct_ratio"), 6)
            .alias("avg_terminal_ratio"),
        )
        .orderBy("source")
    )


ORACLE_C4_FILTER_STATS = r"""
WITH t AS (
  SELECT source, text,
         list_filter(string_split(text, chr(10)),
                     l -> length(trim(l)) > 0) AS lines
  FROM documents
), m AS (
  SELECT source,
         len(lines) AS n_lines,
         CASE WHEN len(lines) = 0 THEN 0.0
              ELSE round(CAST(list_sum(list_transform(lines,
                   l -> length(l))) AS DOUBLE) / len(lines), 4)
         END AS mean_len,
         CASE WHEN len(lines) = 0 THEN 0.0
              ELSE round(CAST(len(list_filter(lines,
                   l -> regexp_matches(trim(l), '[.!?"]$')))
                   AS DOUBLE) / len(lines), 6)
         END AS term_ratio,
         contains(lower(text), 'lorem ipsum') AS lorem,
         contains(text, '{') AS curly
  FROM t
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_lines >= 3 AND mean_len >= 20.0
                      AND term_ratio >= 0.5 AND NOT lorem
                      AND NOT curly
                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(AVG(mean_len), 4) AS avg_line_len,
       round(AVG(term_ratio), 6) AS avg_terminal_ratio
FROM m GROUP BY source ORDER BY source
"""


R3_QUERIES["c4_filter_stats"] = (
    q_c4_filter_stats, ORACLE_C4_FILTER_STATS,
    "C4-style curation flags rollup vs SQL oracle")


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal (Rae et al. 2021 §A1.1: docs
    whose most frequent word dominates are boilerplate/degenerate):
    per-doc top-word fraction via explode + two-level aggregation (the
    measured-fast shape for per-token work in this repo — nested array
    HOFs interpret per element), rolled up per lang."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang",
        F.explode(tokens(F.lower(F.col("text")))).alias("w"),
    )
    per_word = words.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).alias("c"))
    per_doc = per_word.groupBy("doc_id", "lang").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double"))
        .alias("top_frac"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("top_frac"), 6).alias("avg_top_word_frac"),
            F.sum((F.col("top_frac") > 0.2).cast("long"))
            .alias("n_repetitive"),
        )
        .orderBy("lang")
    )


ORACLE_REPETITION_STATS = r"""
WITH words AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
), per_word AS (
  SELECT doc_id, lang, w, COUNT(*) AS c
  FROM words GROUP BY doc_id, lang, w
), per_doc AS (
  SELECT doc_id, lang,
         CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_frac
  FROM per_word GROUP BY doc_id, lang
)
SELECT lang, COUNT(*) AS n_docs,
       round(AVG(top_frac), 6) AS avg_top_word_frac,
       CAST(SUM(CASE WHEN top_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive
FROM per_doc GROUP BY lang ORDER BY lang
"""


R3_QUERIES["repetition_stats"] = (
    q_repetition_stats, ORACLE_REPETITION_STATS,
    "Gopher top-word repetition rollup vs SQL oracle")
