"""Behavioral / event-analytics queries with DuckDB oracles.

The reference's analytics surface stops at group-count rollups
(workspace.go:214-256) and the simulator's sample+group read workload
(sim.go:244-289). A user pointing this engine at an event stream needs
the standard behavioral toolkit on top: funnels, cohort retention,
sessionization stats, running/moving aggregates, per-group top-k,
quantile bucketing, and transition matrices. Every query here is a
declarative DataFrame plan (windows + hash aggs, no Python UDFs) and
ships an ANSI-SQL oracle.

Determinism discipline (hash-compared against DuckDB):
  - money/value sums go through DECIMAL(18,2) (exact, order-free) and
    cast to DOUBLE only at the end;
  - running/moving sums accumulate the DECIMAL, not the DOUBLE;
  - correlation/covariance use the algebraic decomposition over exact
    decimal power sums, combined in DOUBLE with the same expression
    tree on both sides (IEEE ops on identical operands are identical);
  - durations sum as integer microseconds (unix_micros/epoch_us);
  - every window order has a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbird_spark.sources.tables import load_table


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Funnel: signup -> first view after signup -> first purchase after that
# view, per user; one summary row of stage survivor counts.
# ---------------------------------------------------------------------------

def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "view") & (F.col("ts") > F.col("t1")),
               F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when((F.col("event_type") == "purchase")
               & (F.col("ts") > F.col("t2")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    return per_user.agg(
        F.count(F.col("t1")).alias("n_signup"),
        F.count(F.col("t2")).alias("n_view_after"),
        F.count(F.col("t3")).alias("n_purchase_after"),
    )


ORACLE_FUNNEL_STEPS = """
WITH s1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'signup' THEN ts END)
              OVER (PARTITION BY user_id) AS t1
  FROM events
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM s2
), per_user AS (
  SELECT user_id, ANY_VALUE(t1) AS t1, ANY_VALUE(t2) AS t2,
         ANY_VALUE(t3) AS t3
  FROM s3 GROUP BY user_id
)
-- window results are constant per user_id, so ANY_VALUE is deterministic
SELECT COUNT(t1) AS n_signup, COUNT(t2) AS n_view_after,
       COUNT(t3) AS n_purchase_after
FROM per_user
"""


# ---------------------------------------------------------------------------
# Cohort retention: cohort = month of first event; count distinct users
# active at each month offset from their cohort.
# ---------------------------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = e.withColumn("cohort_month",
                     F.date_trunc("month", F.min("ts").over(w)))
    e = e.withColumn("activity_month", F.date_trunc("month", F.col("ts")))
    offset = (
        (F.year("activity_month") - F.year("cohort_month")) * 12
        + (F.month("activity_month") - F.month("cohort_month"))
    ).cast("bigint")
    return (
        e.withColumn("month_offset", offset)
        .groupBy("cohort_month", "month_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_COHORT_RETENTION = """
WITH c AS (
  SELECT user_id, ts,
         CAST(date_trunc('month', MIN(ts) OVER (PARTITION BY user_id))
              AS TIMESTAMP) AS cohort_month,
         CAST(date_trunc('month', ts) AS TIMESTAMP) AS activity_month
  FROM events
)
SELECT cohort_month,
       CAST((year(activity_month) - year(cohort_month)) * 12
            + (month(activity_month) - month(cohort_month)) AS BIGINT)
         AS month_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM c GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sessionization summary: 30-minute-gap sessions, one row of corpus-level
# stats. Durations sum as integer microseconds (exact).
# ---------------------------------------------------------------------------

def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ has no epoch; session tz is UTC so the ltz cast is an identity
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    e = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000000), F.lit(1))
        .otherwise(F.lit(0)),
    )
    e = e.withColumn(
        "sid",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = e.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts").cast("timestamp"))
         - F.unix_micros(F.min("ts").cast("timestamp"))).alias("dur_us"),
    )
    return sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        (F.sum("n_events").cast("double")
         / F.count(F.lit(1))).alias("events_per_session"),
        (F.sum("dur_us").cast("double")
         / F.count(F.lit(1)) / F.lit(1000000.0)).alias("avg_duration_s"),
    )


ORACLE_SESSION_STATS = """
WITH m AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
), sess AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM s GROUP BY user_id, sid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS events_per_session,
       CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_duration_s
FROM sess
"""


# ---------------------------------------------------------------------------
# Running (cumulative) monthly revenue — the accumulation stays DECIMAL
# so frame-evaluation order can't perturb the result.
# ---------------------------------------------------------------------------

def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(_dec("o_totalprice")).alias("rev_dec"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.withColumn("cum_revenue",
                           F.sum("rev_dec").over(w).cast("double"))
        .select("month", F.col("rev_dec").cast("double").alias("revenue"),
                "cum_revenue")
    )


ORACLE_RUNNING_REVENUE = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT month, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER (ORDER BY month
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS cum_revenue
FROM m
"""


# ---------------------------------------------------------------------------
# 7-row moving average of daily revenue (ROWS frame; decimal sum / count
# in double).
# ---------------------------------------------------------------------------

def q_moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(_dec("o_totalprice")).alias("rev_dec"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.sum("rev_dec").over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("ma7"),
    )


ORACLE_MOVING_AVG_REVENUE = """
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT day, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7
FROM d
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# First/last order per market segment via rank-1 rows from both ends
# (portable min_by/max_by with a unique tiebreak).
# ---------------------------------------------------------------------------

def q_seg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    asc = Window.partitionBy("c_mktsegment").orderBy("o_orderdate",
                                                     "o_orderkey")
    desc = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = j.select(
        "c_mktsegment", "o_orderkey", "o_totalprice",
        F.row_number().over(asc).alias("rn_first"),
        F.row_number().over(desc).alias("rn_last"),
    )
    return (
        ranked.filter((F.col("rn_first") == 1) | (F.col("rn_last") == 1))
        .groupBy("c_mktsegment")
        .agg(
            F.max(F.when(F.col("rn_first") == 1, F.col("o_orderkey")))
            .alias("first_orderkey"),
            F.max(F.when(F.col("rn_first") == 1,
                         _dec("o_totalprice"))).cast("double")
            .alias("first_price"),
            F.max(F.when(F.col("rn_last") == 1, F.col("o_orderkey")))
            .alias("last_orderkey"),
            F.max(F.when(F.col("rn_last") == 1,
                         _dec("o_totalprice"))).cast("double")
            .alias("last_price"),
        )
    )


ORACLE_SEG_FIRST_LAST = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_orderdate, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_orderdate, o_orderkey) AS rn_first,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
           AS rn_last
  FROM j
)
SELECT c_mktsegment,
       MAX(CASE WHEN rn_first = 1 THEN o_orderkey END) AS first_orderkey,
       CAST(MAX(CASE WHEN rn_first = 1
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS first_price,
       MAX(CASE WHEN rn_last = 1 THEN o_orderkey END) AS last_orderkey,
       CAST(MAX(CASE WHEN rn_last = 1
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS last_price
FROM r
WHERE rn_first = 1 OR rn_last = 1
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# percent_rank of account balance within nation; top-decile census.
# (rank-1)/(n-1) is the same integer division in both engines.
# ---------------------------------------------------------------------------

def q_percent_rank_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    ranked = c.select(
        "c_nationkey",
        _dec("c_acctbal").alias("bal"),
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        ranked.filter(F.col("pr") >= 0.9)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_top_decile"),
            F.min("bal").cast("double").alias("min_top_balance"),
        )
        .withColumn("c_nationkey", F.col("c_nationkey").cast("int"))
    )


ORACLE_PERCENT_RANK_BALANCE = """
WITH r AS (
  SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         percent_rank() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal) AS pr
  FROM customer
)
SELECT CAST(c_nationkey AS INT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_top_decile,
       CAST(MIN(bal) AS DOUBLE) AS min_top_balance
FROM r WHERE pr >= 0.9 GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Ordered string aggregation: region -> comma-joined sorted nation names.
# ---------------------------------------------------------------------------

def q_region_nations_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",")
            .alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


ORACLE_REGION_NATIONS_AGG = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# Correlation / covariance / OLS slope of price vs quantity per return
# flag — algebraic decomposition over exact decimal power sums so both
# engines combine identical doubles. (Plain corr()/covar_samp() is a
# float fold whose summation order differs across engines.)
# ---------------------------------------------------------------------------

def q_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,3)")
    y = F.col("l_extendedprice").cast("decimal(18,3)")
    sums = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,6)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,6)")).cast("double").alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        # the sqrt path can differ by 1 ulp across engines (FMA
        # contraction in the variance product); 12 decimals is exact
        # for every digit that survives the decomposition anyway
        F.round(cov_n / F.sqrt(var_x * var_y), 12).alias("corr_qty_price"),
        (cov_n / (F.col("n") * (F.col("n") - 1))).alias("covar_samp"),
        (cov_n / var_x).alias("slope"),
    )


ORACLE_CORR_PRICE_QTY = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,3))
                       * CAST(l_extendedprice AS DECIMAL(18,3))
                       AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,3))
                       * CAST(l_quantity AS DECIMAL(18,3))
                       AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,3))
                       * CAST(l_extendedprice AS DECIMAL(18,3))
                       AS DECIMAL(38,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 12)
         AS corr_qty_price,
       (n * sxy - sx * sy) / (n * (n - 1)) AS covar_samp,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
FROM s
"""


# ---------------------------------------------------------------------------
# Fixed-width histogram of order totals (bucket = floor(price / 50k)).
# ---------------------------------------------------------------------------

def q_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("bucket_value"),
        )
    )


ORACLE_HISTOGRAM_PRICE = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS bucket_value
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Top-2 orders per customer (row_number top-k with unique tiebreak) —
# the per-group variant of O6's top-k.
# ---------------------------------------------------------------------------

def q_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey",
            _dec("o_totalprice").cast("double").alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


ORACLE_TOP_ORDERS_PER_CUST = """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, price, rn FROM r WHERE rn <= 2
"""


# ---------------------------------------------------------------------------
# ntile quartiles of customer balance (global, unique tiebreak) with
# per-quartile stats.
# ---------------------------------------------------------------------------

def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select(_dec("c_acctbal").alias("bal"),
                 F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("bal").cast("double").alias("min_bal"),
            F.max("bal").cast("double").alias("max_bal"),
            F.sum("bal").cast("double").alias("sum_bal"),
        )
        .withColumn("quartile", F.col("quartile").cast("bigint"))
    )


ORACLE_NTILE_QUARTILES = """
WITH q AS (
  SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT CAST(quartile AS BIGINT) AS quartile,
       COUNT(*) AS n_customers,
       CAST(MIN(bal) AS DOUBLE) AS min_bal,
       CAST(MAX(bal) AS DOUBLE) AS max_bal,
       CAST(SUM(bal) AS DOUBLE) AS sum_bal
FROM q GROUP BY quartile
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts) per user
# stream, ordered by (ts, event_id).
# ---------------------------------------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type",
                 F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


ORACLE_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM t WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Day-of-week activity profile. Spark dayofweek() is 1=Sunday..7;
# DuckDB dayofweek() is 0=Sunday..6 — normalized to 0-based here.
# ---------------------------------------------------------------------------

def q_dow_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


ORACLE_DOW_ACTIVITY = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Stratified exact sampling: k docs per source, membership decided by
# md5 order (engine-independent, re-run-stable) — the balanced
# subsample shape for mixing training sources. rand()-based sampleBy
# can't give exact-k or reproducible membership; hash-rank does both.
# ---------------------------------------------------------------------------

def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


ORACLE_STRATIFIED_SAMPLE = """
WITH r AS (
  SELECT source, lang, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM r WHERE rk <= 50 GROUP BY source
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split on the first md5 hex digit
# (0-b: 75% train, c-d: 12.5% val, e-f: 12.5% test) — assignment is a
# pure function of the key, so backfills and engines agree and the
# predicate needs no shuffle.
# ---------------------------------------------------------------------------

def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(digit < "c", "train")
        .when(digit < "e", "val")
        .otherwise("test")
    )
    return (
        d.groupBy("source", split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


ORACLE_DATASET_SPLIT = """
SELECT source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
            THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
            THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk): documents in deterministic
# md5 order, running token total, chunk = floor(cumsum/budget) — the
# standard LLM-pretraining packing where the corpus is one token
# stream split every `budget` tokens (documents may straddle chunk
# boundaries). Per-chunk stats expose fill/fragmentation. One window
# cumsum + one hash agg; no Python.
# ---------------------------------------------------------------------------

def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.functions.text import bpe_ish_token_count

    budget = 512
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
        bpe_ish_token_count(F.col("text")).alias("n_tok"),
    )
    w = Window.orderBy("ord_key", "doc_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    chunk = F.floor((F.sum("n_tok").over(w) - F.col("n_tok"))
                    / F.lit(budget))
    return (
        toks.withColumn("chunk_id", chunk)
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


ORACLE_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ord_key,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))
           AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         CAST(FLOOR((SUM(n_tok) OVER (ORDER BY ord_key, doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tok)
                    / 512) AS BIGINT) AS chunk_id
  FROM t
)
SELECT chunk_id, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM c GROUP BY chunk_id
"""


# ---------------------------------------------------------------------------
# Mixture rebalancing: downsample each source toward an equal share of
# the corpus — keep fraction min(1, target/actual) decided by md5 slot,
# so membership is reproducible and the filter is a pure function of
# (doc_id, per-source count). The per-source counts arrive by broadcast
# (tiny), never a row-level shuffle.
# ---------------------------------------------------------------------------

def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    slot = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long") % 10000
    )
    n_sources = 20  # fixture sources; target share = total / n_sources
    kept = (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "keep_bps",
            F.least(
                F.lit(10000),
                # explicit floor: double->long casts truncate in Spark
                # but round in DuckDB
                F.floor(F.lit(10000) * F.col("n_total")
                        / F.lit(n_sources) / F.col("n_src")).cast("long"),
            ),
        )
        .filter(slot < F.col("keep_bps"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days since
    last order vs corpus max date), frequency, monetary -> quartile
    codes via ntile -> segment census. One scan, one per-customer agg,
    three ntiles over the aggregate frame.

    Scale note: exact ntile is a global sort of the per-customer frame
    (fine to ~100M customers); past that, swap the three windows for
    percentile_approx thresholds + comparisons — same output contract,
    no global sort (the decile_stats query documents the exact
    variant's cost class)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .alias("monetary"),
    )
    maxd = per_cust.agg(F.max("last_order").alias("m"))
    scored = per_cust.crossJoin(F.broadcast(maxd)).withColumn(
        "recency_days", F.datediff(F.col("m"), F.col("last_order")))
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    seg = scored.select(
        F.ntile(4).over(r_w).alias("r"),
        F.ntile(4).over(f_w).alias("f"),
        F.ntile(4).over(m_w).alias("m_q"),
    )
    return (
        seg.groupBy("r", "f", "m_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r", "f", "m_q")
    )


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, frequency, monetary,
         date_diff('day', last_order, (SELECT MAX(last_order)
                                       FROM per_cust)) AS recency_days
  FROM per_cust
), seg AS (
  SELECT
    NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r,
    NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f,
    NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_q
  FROM scored
)
SELECT r, f, m_q, COUNT(*) AS n_customers
FROM seg GROUP BY r, f, m_q ORDER BY r, f, m_q
"""


def q_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users with week-over-week growth: distinct users
    per ISO week + lag-based delta. Exact distinct per week (one
    shuffle), then the WoW window over the tiny weekly frame."""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(F.date_trunc("week", F.col("ts")).cast("date")
                 .alias("week_start"),
                 "user_id")
        .groupBy("week_start")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    w = Window.orderBy("week_start")
    return (
        weekly.withColumn("prev", F.lag("wau").over(w))
        .select(
            "week_start", "wau",
            F.coalesce(F.col("wau") - F.col("prev"), F.lit(0))
            .alias("wow_delta"),
        )
        .orderBy("week_start")
    )


ORACLE_WAU = """
WITH weekly AS (
  SELECT date_trunc('week', ts) AS week_start,
         COUNT(DISTINCT user_id) AS wau
  FROM events GROUP BY 1
)
SELECT week_start, wau,
       COALESCE(wau - LAG(wau) OVER (ORDER BY week_start), 0)
         AS wow_delta
FROM weekly ORDER BY week_start
"""


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part pairs: parts co-ordered in the same order,
    ranked by lift = P(a,b) / (P(a) P(b)), min support 5 orders. The
    frequent-itemset primitive: pairs are exploded per order from one
    collect_list (bounded by basket size — TPC-H baskets hold <= 7
    distinct parts — never all-pairs over parts), per-part supports
    broadcast. The exploded form replaces the r8 order-key self-join:
    the ids are sorted and distinct within a basket, so pairing each
    id with the ids after it yields exactly the pa < pb pairs without
    shuffling the baskets twice (same restructure as
    winnow_shared_pairs; measured ~12% at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.select("l_orderkey").distinct() \
        .agg(F.count(F.lit(1)).alias("n_orders"))
    supp = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("supp"))
    ob = (
        baskets.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    lhs = ob.select("__ids", F.posexplode("__ids").alias("__i", "pa"))
    pp = lhs.select(
        "pa",
        F.explode(F.slice("__ids", F.col("__i") + F.lit(2),
                          F.size("__ids"))).alias("pb"))
    pairs = (
        pp.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    sa = supp.select(F.col("l_partkey").alias("pa"),
                     F.col("supp").alias("supp_a"))
    sb = supp.select(F.col("l_partkey").alias("pb"),
                     F.col("supp").alias("supp_b"))
    return (
        pairs.join(sa, "pa").join(sb, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa", "pb", "n_both",
            F.round(F.col("n_both") * F.col("n_orders")
                    / (F.col("supp_a") * F.col("supp_b")).cast("double"),
                    6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(25)
    )


ORACLE_BASKET = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
supp AS (
  SELECT l_partkey, COUNT(*) AS supp FROM baskets GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_both
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT pa, pb, n_both,
       round(n_both * n.n_orders
             / CAST(sa.supp * sb.supp AS DOUBLE), 6) AS lift
FROM pairs
JOIN supp sa ON sa.l_partkey = pa
JOIN supp sb ON sb.l_partkey = pb
CROSS JOIN n
ORDER BY lift DESC, pa, pb LIMIT 25
"""


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (tau=0.7, the
    multilingual-LM standard): p_i ∝ tokens_i^tau flattens the natural
    distribution toward uniform; `boost` (weight / natural share) is
    the implied per-source repeat factor. One scan + one tiny
    aggregate; the normalizing windows run over the ~20-row post-agg
    frame, not the data."""
    from hummingbird_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("n_tokens"))
    whole = Window.partitionBy()
    w = F.pow(F.col("n_tokens").cast("double"), 0.7)
    return (
        counts
        .withColumn("weight", F.round(w / F.sum(w).over(whole), 6))
        .withColumn(
            "boost",
            F.round(
                (w / F.sum(w).over(whole))
                / (F.col("n_tokens")
                   / F.sum("n_tokens").over(whole).cast("double")), 6))
        .select("source", "n_tokens", "weight", "boost")
        .orderBy("source")
    )


ORACLE_MIXTURE_TEMPERATURE = r"""
WITH c AS (
  SELECT source,
         CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+'))
                  END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_tokens,
       round(pow(n_tokens, 0.7) / SUM(pow(n_tokens, 0.7)) OVER (), 6)
         AS weight,
       round((pow(n_tokens, 0.7) / SUM(pow(n_tokens, 0.7)) OVER ())
             / (n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE)), 6)
         AS boost
FROM c ORDER BY source
"""


ORACLE_MIXTURE_REBALANCE = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
), total AS (
  SELECT COUNT(*) AS n_total FROM documents
), kept AS (
  SELECT d.source, d.n_chars
  FROM documents d JOIN counts USING (source) CROSS JOIN total
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 10000
        < LEAST(10000, CAST(FLOOR(10000 * n_total / 20 / n_src) AS BIGINT))
)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM kept GROUP BY source
"""


ANALYTICS_QUERIES: dict[str, tuple] = {
    "funnel_steps": (
        q_funnel_steps, ORACLE_FUNNEL_STEPS,
        "ordered funnel survivor counts (chained window mins per user)"),
    "cohort_retention": (
        q_cohort_retention, ORACLE_COHORT_RETENTION,
        "monthly cohort x offset distinct-user retention grid"),
    "session_stats": (
        q_session_stats, ORACLE_SESSION_STATS,
        "gap-sessionization corpus stats (integer-us durations)"),
    "running_revenue": (
        q_running_revenue, ORACLE_RUNNING_REVENUE,
        "cumulative monthly revenue, decimal-exact running sum"),
    "moving_avg_revenue": (
        q_moving_avg_revenue, ORACLE_MOVING_AVG_REVENUE,
        "7-row moving average over daily revenue"),
    "seg_first_last": (
        q_seg_first_last, ORACLE_SEG_FIRST_LAST,
        "first/last order per segment (portable arg_min/arg_max)"),
    "percent_rank_balance": (
        q_percent_rank_balance, ORACLE_PERCENT_RANK_BALANCE,
        "top-decile-by-percent_rank census per nation"),
    "region_nations_agg": (
        q_region_nations_agg, ORACLE_REGION_NATIONS_AGG,
        "ordered string_agg (array_sort+array_join vs string_agg)"),
    "corr_price_qty": (
        q_corr_price_qty, ORACLE_CORR_PRICE_QTY,
        "corr/covar/slope via exact decimal power sums"),
    "histogram_price": (
        q_histogram_price, ORACLE_HISTOGRAM_PRICE,
        "fixed-width histogram bucketing"),
    "top_orders_per_cust": (
        q_top_orders_per_cust, ORACLE_TOP_ORDERS_PER_CUST,
        "per-group top-k (row_number <= 2, unique tiebreak)"),
    "ntile_quartiles": (
        q_ntile_quartiles, ORACLE_NTILE_QUARTILES,
        "ntile(4) bucketing with per-quartile stats"),
    "event_transitions": (
        q_event_transitions, ORACLE_EVENT_TRANSITIONS,
        "first-order Markov transition counts over user streams"),
    "dow_activity": (
        q_dow_activity, ORACLE_DOW_ACTIVITY,
        "day-of-week activity profile (dow normalization)"),
    "stratified_sample": (
        q_stratified_sample, ORACLE_STRATIFIED_SAMPLE,
        "exact-k per-source sample by md5 rank (reproducible)"),
    "dataset_split": (
        q_dataset_split, ORACLE_DATASET_SPLIT,
        "hash-digit train/val/test split census"),
    "pack_sequences": (
        q_pack_sequences, ORACLE_PACK_SEQUENCES,
        "concat-then-chunk token packing (window cumsum)"),
    "mixture_rebalance": (
        q_mixture_rebalance, ORACLE_MIXTURE_REBALANCE,
        "hash-deterministic downsample to an equal source mixture"),
    "mixture_temperature": (
        q_mixture_temperature, ORACLE_MIXTURE_TEMPERATURE,
        "temperature-scaled (tau=0.7) source sampling weights"),
    "rfm_segments": (
        q_rfm_segments, ORACLE_RFM,
        "RFM quartile segmentation census"),
    "weekly_active_users": (
        q_weekly_active_users, ORACLE_WAU,
        "weekly actives with WoW delta"),
    "basket_pairs": (
        q_basket_pairs, ORACLE_BASKET,
        "market-basket co-occurrence by lift (min support 5)"),
}
