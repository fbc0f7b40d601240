"""Window / as-of / range-join / extended-agg queries with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbird_spark.operators.joins import asof_join, range_join
from hummingbird_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from hummingbird_spark.sources.tables import load_table


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# ST10: event-time windows over the events fixture
# ---------------------------------------------------------------------------

def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        e, "ts", "1 hour", "event_type",
        aggs=[F.count(F.lit(1)).alias("n_events"),
              F.sum(_dec("value")).cast("double").alias("total_value")],
    )


ORACLE_WIN_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return sliding_window_agg(
        e, "ts", "1 hour", "30 minutes",
        aggs=[F.count(F.lit(1)).alias("n_events")],
    )


# sliding(1h, 30m) = union of the :00-aligned and :30-aligned hourly grids
ORACLE_WIN_SLIDING = """
WITH grid AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_id FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes') AS win_start,
         event_id
  FROM events
)
SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
       COUNT(*) AS n_events
FROM grid GROUP BY 1, 2
"""


def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return session_window_agg(
        e, "ts", "30 minutes", "user_id",
        aggs=[F.count(F.lit(1)).alias("n_events")],
    )


ORACLE_WIN_SESSION = """
WITH m AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       user_id, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# As-of join: purchase -> most recent prior click by the same user
# (attribution). DuckDB has native ASOF JOIN for the oracle.
# ---------------------------------------------------------------------------

def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    # dedupe clicks at identical (user, ts) to the max id (deterministic)
    clicks = clicks.groupBy("user_id", "click_ts").agg(
        F.max("click_id").alias("click_id")
    )
    out = asof_join(
        purchases, clicks, key="user_id",
        left_time="purchase_ts", right_time="click_ts",
        right_cols=["click_id"],
    )
    # -1 sentinel for "no prior click": a nullable int column turns
    # float64 in pandas (1599 -> 1599.0), which hash-diverges from any
    # engine that keeps ints — the same class of drift as an uncast
    # DuckDB SUM. Both sides coalesce identically.
    return out.select("user_id", "purchase_id", "purchase_ts",
                      "purchase_value",
                      F.coalesce("click_id", F.lit(-1)).alias("click_id"),
                      F.col("click_ts_right").alias("click_ts"))


ORACLE_ASOF = """
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.user_id, p.purchase_id, p.purchase_ts, p.purchase_value,
       COALESCE(c.click_id, -1) AS click_id, c.click_ts
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
"""


def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each click attaches the user's next purchase at
    or after it (time-to-conversion). Exercises asof_join's forward
    direction against DuckDB's native <= ASOF JOIN; latency in exact
    integer microseconds (both engines' subtraction is exact)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").groupBy(
        "user_id", F.col("ts").alias("click_ts")
    ).agg(F.max("event_id").alias("click_id"))
    purchases = e.filter(F.col("event_type") == "purchase").groupBy(
        "user_id", F.col("ts").alias("purchase_ts")
    ).agg(F.max("event_id").alias("purchase_id"))
    out = asof_join(
        clicks, purchases, key="user_id",
        left_time="click_ts", right_time="purchase_ts",
        right_cols=["purchase_id"], direction="forward",
    )
    return out.select(
        "user_id", "click_id", "click_ts",
        F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            # ts is TIMESTAMP_NTZ; session tz is UTC, so the cast is
            # an exact reinterpretation
            F.unix_micros(F.col("purchase_ts_right").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp")),
            F.lit(-1)
        ).alias("latency_us"),
    )


ORACLE_ASOF_FORWARD = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), purch AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.user_id, c.click_id, c.click_ts,
       COALESCE(p.purchase_id, -1) AS purchase_id,
       COALESCE(CAST(date_diff('microsecond', c.click_ts, p.purchase_ts)
                     AS BIGINT), -1) AS latency_us
FROM clicks c
ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.click_ts <= p.purchase_ts
"""


# ---------------------------------------------------------------------------
# Range join: events within 7 days after the user's order date
# ---------------------------------------------------------------------------

def q_range_join_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-signup activity: events by the same user within 7 days after
    each signup event (equi-key on user + time band)."""
    e = load_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("signup_ts"),
    )
    activity = e.select("user_id", "event_id", "ts", "value")
    joined = range_join(
        signups, activity, "s_user", "user_id",
        time_col=F.col("ts"),
        low=F.col("signup_ts"),
        high=F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"),
    ).filter(F.col("event_id") != F.col("signup_id"))
    return (
        joined.groupBy("signup_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(_dec("value")).cast("double").alias("event_value"))
        .orderBy("signup_id")
    )


ORACLE_RANGE_JOIN = """
WITH signups AS (
  SELECT user_id AS s_user, event_id AS signup_id, ts AS signup_ts
  FROM events WHERE event_type = 'signup'
)
SELECT signup_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS event_value
FROM signups JOIN events
  ON s_user = user_id
 AND ts >= signup_ts AND ts <= signup_ts + INTERVAL 7 DAY
 AND event_id <> signup_id
GROUP BY signup_id ORDER BY signup_id
"""


# ---------------------------------------------------------------------------
# Extended aggregates: cube, approx distinct, sample+group (A5)
# ---------------------------------------------------------------------------

def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(_dec("o_totalprice")).cast("double").alias("total"))
    )


ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    per-(status,priority), per-status, and per-priority slices in ONE
    pass — Catalyst expands to a single Expand + hash aggregate, one
    shuffle, instead of three separate groupBys + union. grouping_id
    disambiguates the NULL-as-total rows from genuine NULL keys."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
    """)


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority))
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch — algorithm-specific estimates, rows-only check
    (the exact countDistinct equivalent is in event_type_counts)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
             F.countDistinct("l_partkey").alias("exact_parts"))
        .orderBy("l_returnflag")
    )


def q_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (sim.go:244-247): $sample + $group. Spark's sample is
    seed-deterministic but not reproducible in other engines ->
    rows-only check."""
    return (
        load_table(spark, sf_dir, "events")
        .sample(fraction=0.3, seed=3629)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user-bucket event-type value matrix. Spark pivot()
    with explicit value list (at scale always pass the list — inferring
    it costs an extra distinct scan)."""
    types = ["click", "error", "purchase", "signup", "view"]
    e = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 5).cast("int")
    )
    return (
        e.groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(F.sum(_dec("value")).cast("double"))
        .orderBy("user_bucket")
    )


ORACLE_PIVOT = """
SELECT CAST(user_id % 5 AS INT) AS user_bucket,
  CAST(SUM(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
  CAST(SUM(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
  CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
  CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
  CAST(SUM(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
FROM events GROUP BY user_bucket ORDER BY user_bucket
"""


def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies (explode + count + top-k with total
    ordering) — the vocabulary-building primitive."""
    from hummingbird_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(20)
    )


ORACLE_TOKEN_FREQ = r"""
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0)
GROUP BY token ORDER BY freq DESC, token ASC LIMIT 20
"""


WINDOW_QUERIES: dict[str, tuple] = {
    "pivot_event_values": (q_pivot_event_values, ORACLE_PIVOT,
                           "pivot with explicit value list"),
    "token_frequencies": (q_token_frequencies, ORACLE_TOKEN_FREQ,
                          "explode+count vocabulary top-k"),
    "win_tumbling": (q_win_tumbling, ORACLE_WIN_TUMBLING,
                     "ST10 tumbling window agg"),
    "win_sliding": (q_win_sliding, ORACLE_WIN_SLIDING,
                    "ST10 sliding window agg"),
    "win_session": (q_win_session, ORACLE_WIN_SESSION,
                    "ST10 session window agg"),
    "asof_attribution": (q_asof_attribution, ORACLE_ASOF,
                         "as-of join (union+window impl vs native ASOF)"),
    "asof_next_purchase": (q_asof_next_purchase, ORACLE_ASOF_FORWARD,
                           "forward as-of join (time-to-conversion)"),
    "range_join_week": (q_range_join_week, ORACLE_RANGE_JOIN,
                        "equi+interval range join"),
    "cube_agg": (q_cube_agg, ORACLE_CUBE, "cube grouping sets"),
    "grouping_sets": (q_grouping_sets, ORACLE_GROUPING_SETS,
                      "explicit GROUPING SETS, single-pass Expand"),
    "approx_distinct": (q_approx_distinct, None,
                        "HLL++ approx distinct (rows-only)"),
    "sample_group": (q_sample_group, None, "A5 sample+group (rows-only)"),
}
