"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark AND its oracle_sql() on DuckDB over the same
parquet, then compare row count + column names + sorted values exactly.

This is deliberately strict (exact equality, not approx) because the
driver compares order-insensitive value *hashes* — any float drift or
alias mismatch that would fail the gate fails here first.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from hummingbird_spark.plans.queries import QUERIES
from tests.conftest import SF_SMOKE

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)  # full precision — exact bit comparison
    return repr(value)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(
        tuple(_canon(row[i]) for i in order) for row in rows
    )
    return sorted_cols, out


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.oracle])
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_SMOKE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_cols, s_rows = _normalize(spark_cols, spark_rows)
    d_cols, d_rows = _normalize(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{mismatches[0]}"
    )

    # The driver hashes values through pandas, where DuckDB HUGEINT
    # (e.g. an uncast SUM over integers) materializes as float64 —
    # "1791.0" vs Spark's "1791" hash-differently even though fetchall
    # compares equal above (this exact drift failed priority_linestatus
    # in round 1). Flag any integral Spark column whose oracle side
    # would go through pandas as floating.
    int_spark = {
        f.name for f in sdf.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "smallint",
                                         "tinyint")
    }
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    for col in int_spark:
        assert not str(duck_pdf[col].dtype).startswith("float"), (
            f"{name}: oracle column {col!r} becomes {duck_pdf[col].dtype}"
            f" in pandas but Spark returns an integer type — add an"
            f" explicit CAST(... AS BIGINT) in the oracle SQL"
        )


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and return a schema."""
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.spark(spark, SF_SMOKE)
            assert df.columns, name
            df.limit(5).collect()
