"""Z-order clustering: multi-dimensional data skipping for parquet
(the technique behind Delta OPTIMIZE ZORDER / Iceberg sort-order
z-curves, built here with nothing but Column expressions).

Why it exists at 100 TB: min/max row-group stats prune a scan only
along the physical sort order. Sorting by `l_partkey` makes partkey
predicates cheap but leaves `l_suppkey` predicates reading every file.
Interleaving the bits of both coordinates (the Morton/Z space-filling
curve) makes files cover small HYPER-RECTANGLES of the key space, so a
predicate on ANY clustered dimension overlaps only a fraction of the
files. tests/test_zorder.py measures exactly that with parquet footer
stats: after z-ordering, a box predicate on the second dimension prunes
most files; after linear sorting it prunes none.

Shape notes:
  - per-dimension coordinates come from `width_bucket` over the
    column's min/max (one tiny agg job) — 2^bits uniform cells per
    dimension; equi-depth boundaries (approxQuantile) drop in for
    heavily skewed columns without changing the interleave,
  - the interleave is a fixed chain of shift/and/or terms — pure
    codegen, no UDF, ~2*bits terms per dimension,
  - the write is `repartitionByRange(z)` + `sortWithinPartitions(z)`:
    one range shuffle, each output file covers a contiguous z-range
    (= a small box), footer stats do the rest at read time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(coords: list[Column], bits: int) -> Column:
    """Morton code: bit i of dimension d lands at position
    i * n_dims + d of the z-value. Supports n_dims * bits <= 63."""
    n = len(coords)
    assert n * bits <= 63, "z-value must fit a signed 64-bit long"
    terms = []
    for d, c in enumerate(coords):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)),
                    i * n + d,
                )
            )
    # Column.__or__ is LOGICAL or in PySpark — bitwiseOR is the operator
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue_column(df: DataFrame, cols: list[str], bits: int = 10) -> Column:
    """Build the z-value expression for `cols` (numeric). Column
    min/max are collected once (a metadata-cheap 1-row agg) to scale
    each dimension into [0, 2^bits) grid cells."""
    stats = df.agg(*(
        expr
        for c in cols
        for expr in (F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}"))
    )).collect()[0]
    cells = 2 ** bits
    coords = []
    for c in cols:
        if stats[f"__mn_{c}"] is None or stats[f"__mx_{c}"] is None:
            # empty input or all-null clustered column: no stats to
            # grid on — surface it instead of a float(None) TypeError
            raise ValueError(
                f"cannot z-order on {c!r}: no non-null values "
                f"(empty DataFrame or all-null column)"
            )
        mn = float(stats[f"__mn_{c}"])
        mx = float(stats[f"__mx_{c}"])
        span = (mx - mn) or 1.0
        cell = F.floor(
            (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
            * F.lit(cells - 1)
        ).cast("long")
        # clamp for values at/above max (floor hits cells-1 exactly)
        coords.append(F.greatest(F.lit(0), F.least(cell, F.lit(cells - 1))))
    return _interleave(coords, bits)


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_files: int = 32,
    bits: int = 10,
) -> DataFrame:
    """Return `df` physically clustered along the z-curve of `cols`:
    range-partitioned into `num_files` contiguous z-slices, sorted by z
    inside each. Write the result with a plain `.write.parquet` —
    each output file's footer then carries tight min/max boxes on every
    clustered dimension."""
    z = zvalue_column(df, cols, bits=bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
