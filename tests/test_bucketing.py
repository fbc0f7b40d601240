"""Bucketed-table layout tests (SURVEY §2.11 D3 -> Spark bucketing).

The claim that matters at 100 TB: once two fact tables are bucketed on
the join key with equal bucket counts, joining them produces NO shuffle
exchange on either side — the one-time bucketed write replaces the
per-query repartition of the reference's chunk pre-splitting
(config_copier.go:244-342). These tests assert the PLAN, not just the
rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hummingbird_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from hummingbird_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    """lineitem + orders bucketed on the join key (orderkey), 8 buckets."""
    l = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(l, "bt_lineitem", "l_orderkey", num_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(o, "bt_orders", "l_orderkey", num_buckets=8,
                   sort_cols=["l_orderkey"])
    yield "bt_lineitem", "bt_orders"
    for t in ("bt_lineitem", "bt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    lt, ot = bucketed_tables
    joined = colocated_join(spark, lt, ot, "l_orderkey")
    plan = _executed_plan(joined)
    assert "SortMergeJoin" in plan
    # the whole point: neither side shuffles
    assert "Exchange hashpartitioning" not in plan


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, ot = bucketed_tables
    joined = colocated_join(spark, lt, ot, "l_orderkey")
    l = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    expected = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = _executed_plan(agg)
    assert "Exchange hashpartitioning" not in plan


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Sanity: the same join WITHOUT bucketing shuffles — proves the
    no-Exchange assertion above is the bucketing's doing."""
    l = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    ).hint("merge")
    plan = _executed_plan(l.join(o, "l_orderkey"))
    assert "Exchange hashpartitioning" in plan
