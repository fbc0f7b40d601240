"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — every implemented operator from SURVEY.md §2, keyed by name.
oracle_sql()   — DuckDB-runnable ANSI SQL equivalent per query (same column
                 names/aliases; driver hash-compares at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hummingbird_spark.plans.queries import oracle_sql_map, query_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary agg) on /root/testdata/sf0.001."""
    return query_map()["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
