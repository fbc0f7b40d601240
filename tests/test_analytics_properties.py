"""Property tests for the behavioral-analytics window logic: the Spark
formulations of gap-sessionization and ordered funnels must agree with
independently-written brute-force Python references on arbitrary event
streams (random users, timestamps, types — including ties and
single-event users)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

T0 = dt.datetime(2024, 1, 1)
GAP_S = 30 * 60

# (user, minutes-offset, type); duplicate timestamps allowed on purpose
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5000),
              st.sampled_from(["signup", "view", "purchase"])),
    min_size=1, max_size=60,
)


def _df(spark, evs):
    rows = [
        (i, uid, T0 + dt.timedelta(minutes=m), et)
        for i, (uid, m, et) in enumerate(evs)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def naive_sessions(evs):
    """Sessions per user via direct gap splitting: (n_sessions,
    n_events, total_duration_seconds)."""
    by_user: dict = {}
    for i, (uid, m, _et) in enumerate(evs):
        by_user.setdefault(uid, []).append((m * 60, i))
    n_sessions = 0
    total_dur = 0
    for uid, stamps in by_user.items():
        stamps.sort()  # (seconds, event_id) — same tiebreak as the SQL
        cur_start = None
        prev = None
        for s, _i in stamps:
            if prev is None or s - prev > GAP_S:
                if cur_start is not None:
                    total_dur += prev - cur_start
                n_sessions += 1
                cur_start = s
            prev = s
        total_dur += prev - cur_start
    return n_sessions, len(evs), total_dur


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy)
def test_gap_sessionization_matches_naive(spark, evs):
    e = _df(spark, evs)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    e = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > GAP_S * 1000000), F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "sid",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = e.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
         / 1000000).alias("dur_s"),
    ).collect()
    got = (len(sess), sum(r.n for r in sess),
           int(sum(r.dur_s for r in sess)))
    assert got == naive_sessions(evs)


def naive_funnel(evs):
    """Stage survivors: first signup, first view strictly after it,
    first purchase strictly after that view."""
    by_user: dict = {}
    for uid, m, et in evs:
        by_user.setdefault(uid, []).append((m, et))
    n1 = n2 = n3 = 0
    for uid, items in by_user.items():
        t1 = min((m for m, et in items if et == "signup"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min((m for m, et in items if et == "view" and m > t1),
                 default=None)
        if t2 is None:
            continue
        n2 += 1
        t3 = min((m for m, et in items if et == "purchase" and m > t2),
                 default=None)
        if t3 is not None:
            n3 += 1
    return n1, n2, n3


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy)
def test_funnel_stages_match_naive(spark, evs):
    e = _df(spark, evs)
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    e = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "view") & (F.col("ts") > F.col("t1")),
               F.col("ts"))).over(w)
    e = e.withColumn("t2", t2)
    t3 = F.min(
        F.when((F.col("event_type") == "purchase")
               & (F.col("ts") > F.col("t2")), F.col("ts"))).over(w)
    e = e.withColumn("t3", t3)
    per_user = e.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"),
        F.first("t3").alias("t3"))
    r = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"),
        F.count("t3").alias("n3")).first()
    assert (r.n1, r.n2, r.n3) == naive_funnel(evs)
