"""Table profiling: per-column statistics in ONE scan.

The migration-assessment step the reference does with collstats +
sampling (workspace/collection stats feeding task sizing) generalized
to column granularity: row count, null count, distinct count
(approximate by default — exact is a full shuffle per column), and
min/max. One wide aggregate computes every measure in a single pass
over the data; the wide row is then unpivoted driver-side (k columns
-> k result rows, no second scan).

At 100 TB: the approx path is one scan with map-side partial
aggregation and a constant-size state per column (HLL + min/max);
exact=True expands to count(distinct) per column — one Expand +
shuffle, the standard cost of exactness. Use approx for assessment,
exact only when the number feeds a correctness decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = False,
                  include_minmax: bool = True) -> DataFrame:
    """-> (column, dtype, n_rows, n_null, n_distinct[, min_value,
    max_value]) — one row per profiled column, computed in one scan.
    min/max are stringified (heterogeneous types in one result column);
    null-only columns yield null min/max."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c))
                        .alias(f"__dist_{c}"))
        if include_minmax:
            aggs.append(F.min(F.col(c)).cast("string")
                        .alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("string")
                        .alias(f"__max_{c}"))

    wide = df.agg(*aggs).collect()[0]  # one row, 4k+1 scalars

    rows = []
    for c in cols:
        row = {
            "column": c, "dtype": dtypes.get(c, ""),
            "n_rows": wide["__n"],
            "n_null": int(wide[f"__null_{c}"] or 0),
            "n_distinct": int(wide[f"__dist_{c}"] or 0),
        }
        if include_minmax:
            row["min_value"] = wide[f"__min_{c}"]
            row["max_value"] = wide[f"__max_{c}"]
        rows.append(row)
    spark = df.sparkSession
    schema = ("column string, dtype string, n_rows long, n_null long, "
              "n_distinct long")
    if include_minmax:
        schema += ", min_value string, max_value string"
    return spark.createDataFrame(rows, schema)
