"""UniMax budget allocation (Chung et al., "UniMax: Fairer and More
Effective Language Sampling for Large-Scale Multilingual Pretraining",
ICLR 2023) — the mixture-design step that turns per-source token
counts into a training-token allocation: spread the budget as
UNIFORMLY as possible across sources, subject to a per-source epoch
cap (no source repeats more than E times). Low-resource sources get
their full capacity; high-resource sources split the remainder
equally — the published middle ground between natural sampling (head
domination) and temperature flattening (tail over-repetition; see
`mixture_temperature` for that sibling).

Closed form instead of the paper's per-source loop: with capacities
sorted ascending, the "exhausted" sources (those that hit their cap)
form a PREFIX — if source k's cap is below the equal-share of the
budget left after all smaller caps are paid out, every smaller source
is below its share too (caps grow along the sort while the running
share can only grow as exhausted sources release budget). So one
cumulative-sum window finds the crossover and the whole waterfill is
two window expressions — no recursion, no driver loop, and the same
expressions replay verbatim in the DuckDB oracle.

Scale shape: the input is the per-source aggregate (one full-corpus
scan with map-side partial aggregation, done by the caller); the
allocation itself runs over the ~10^2..10^4-row source frame, where a
single-partition window is the correct plan — this is the one place a
global Window.orderBy is deliberate, on a frame bounded by source
cardinality, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def unimax_allocation(counts: DataFrame, budget: float,
                      epoch_cap: float = 4.0,
                      source_col: str = "source",
                      tokens_col: str = "n_tokens") -> DataFrame:
    """counts(source, n_tokens) -> one row per source with:

      capacity    = epoch_cap * n_tokens (the repeat ceiling)
      allocation  = UniMax water-filled token budget (4 dp)
      epochs      = allocation / n_tokens (6 dp; 0 for empty sources)
      weight      = allocation / budget (6 dp)

    sum(allocation) == min(budget, sum(capacity)) up to rounding; ties
    in capacity order break by source name so the result is engine-
    exact and hash-comparable."""
    w_ord = Window.orderBy(F.col("capacity").asc(), F.col(source_col).asc())
    whole = Window.partitionBy()

    sized = counts.select(
        F.col(source_col), F.col(tokens_col),
        (F.lit(float(epoch_cap)) * F.col(tokens_col)).alias("capacity"),
    )
    marked = (
        sized
        .withColumn("__k", F.row_number().over(w_ord))
        .withColumn("__n", F.count(F.lit(1)).over(whole))
        .withColumn(
            "__prev",
            F.coalesce(
                F.sum("capacity").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0)),
        )
        # exhausted iff cap_k <= (budget - S_{k-1}) / (n - k + 1),
        # cross-multiplied to dodge a division in the predicate
        .withColumn(
            "__capped",
            F.col("capacity") * (F.col("__n") - F.col("__k") + 1)
            <= F.lit(float(budget)) - F.col("__prev"),
        )
    )
    n_capped = F.sum(F.col("__capped").cast("long")).over(whole)
    s_capped = F.coalesce(
        F.sum(F.when(F.col("__capped"), F.col("capacity"))).over(whole),
        F.lit(0.0))
    share = F.when(
        F.col("__n") > n_capped,
        (F.lit(float(budget)) - s_capped)
        / (F.col("__n") - n_capped).cast("double"),
    ).otherwise(F.lit(0.0))  # budget covers every cap: no uncapped rows
    alloc = F.round(
        F.when(F.col("__capped"), F.col("capacity")).otherwise(share), 4)
    return (
        marked
        .withColumn("allocation", alloc)
        .withColumn(
            "epochs",
            F.when(F.col(tokens_col) > 0,
                   F.round(F.col("allocation") / F.col(tokens_col), 6))
            .otherwise(F.lit(0.0)))
        .withColumn("weight",
                    F.round(F.col("allocation") / F.lit(float(budget)), 6))
        .select(source_col, tokens_col, "capacity", "allocation",
                "epochs", "weight")
    )
