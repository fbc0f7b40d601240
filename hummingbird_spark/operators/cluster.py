"""Distributed Lloyd's k-means over an embedding column — the
corpus-scale companion to `train_ivf_centroids` (which Lloyd-refines a
bounded driver-side sample, the FAISS recipe). Here every iteration
touches ALL rows, the shape you want when the clustering itself is the
product: semantic bucketing of a training corpus (cluster-balanced
sampling, per-cluster dedup pressure, topic mixtures) rather than a
coarse ANN quantizer.

Scale shape (per iteration, T iterations total):
  - assignment: centroids are a k x dim broadcast (numpy int64 matmul
    over Arrow batches — the same blocked-BLAS seam as `ivf_assign`);
    no shuffle, no skew (a broadcast lookup has no hot keys).
  - update: select(cluster, posexplode(xq)) -> groupBy(cluster, dim)
    SUM — Catalyst's partial aggregation collapses every partition to
    <= k*dim rows map-side, so the shuffle carries k*dim*partitions
    tiny rows regardless of corpus size (the treeAggregate shape for
    free). The driver holds only the k x dim centroid table.
  - T+1 corpus scans total (T update passes + the final assignment);
    Lloyd's floor.

Cross-engine determinism — EXACT, not rounded: input vectors are
quantized to integers (round(x * 1e6)), centroids live in the same
scaled integer space (the mean is re-rounded to an integer each
iteration), and the assignment metric is integer squared euclidean
distance. Integer sums are associative — any aggregation order, any
partitioning, any engine produces bit-identical centroids, so the
whole T-iteration trajectory replays exactly in SQL (unrolled CTEs in
the DuckDB oracle) with zero float-order risk. Magnitudes: |x| <= ~1
=> xq <= ~2e6, dist2 <= dim * (4e6)^2 ~ 1e15 << 2^63.

Ties: argmin picks the lowest cluster id (numpy argmin first-index ==
SQL ORDER BY d2, cluster LIMIT 1). The half-up rounding of the
centroid mean matches DuckDB's round() (both half-away-from-zero);
the mean sum/n is a ratio of exact integers, so the double division
is the same IEEE value on both engines. Empty clusters keep their
previous centroid (documented; the oracle replicates via left join).

Init is seedless-deterministic: the k rows with the smallest
md5(id) — the same uniform-draw idiom as `train_ivf_centroids`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # quantization: 6 decimal places


def _quantize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * SCALE, 0).cast("long"),
        ).alias("__xq"),
    )


def _init_centroids(quant: DataFrame, k: int, id_col: str) -> list[list[int]]:
    rows = (
        quant.withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(k)  # TakeOrdered — no global sort
        .select("__xq")
        .collect()
    )
    return [list(r[0]) for r in rows]


def _assign(quant: DataFrame, centroids: list[list[int]],
            id_col: str) -> DataFrame:
    """(id, __xq, cluster, dist2) — nearest centroid by integer squared
    euclidean distance; ties to the lowest cluster id."""
    import numpy as np
    import pandas as pd

    spark = quant.sparkSession
    b_cent = spark.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.int64))

    def block(it):
        cent = b_cent.value                       # k x d int64
        c_sq = (cent * cent).sum(axis=1)          # |c|^2, k
        for pdf in it:
            if not len(pdf):
                continue
            xm = np.array(list(pdf["__xq"]), dtype=np.int64)  # b x d
            # d2 = |x|^2 - 2 x.c + |c|^2, all int64 (exact)
            cross = xm @ cent.T                   # b x k
            d2 = (xm * xm).sum(axis=1, keepdims=True) - 2 * cross + c_sq
            best = d2.argmin(axis=1)              # first min = lowest id
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "__xq": pdf["__xq"],
                "cluster": best.astype(np.int64),
                "dist2": d2[np.arange(len(best)), best],
            })

    return quant.mapInPandas(
        block, f"{id_col} long, __xq array<long>, cluster long, dist2 long"
    )


def _update(assigned: DataFrame,
            centroids: list[list[int]]) -> list[list[int]]:
    """One Lloyd update: exact integer sums per (cluster, dim), partial-
    aggregated map-side; the driver holds only k*dim rows. Empty
    clusters keep their previous centroid."""
    upd = (
        assigned.select("cluster", F.posexplode("__xq").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    import math

    out = [list(c) for c in centroids]
    for r in upd:
        # half-away-from-zero, matching DuckDB round(); s/n is a ratio
        # of exact integers so the double is engine-identical
        v = r["s"] / r["n"]
        out[r["cluster"]][r["dim"]] = (
            math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5))
    return out


def kmeans_fit(df: DataFrame, k: int = 8, iterations: int = 3,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> list[list[int]]:
    """T full-corpus Lloyd iterations; returns the final k x dim
    integer centroids (scaled-by-1e6 space)."""
    quant = _quantize(df, vec_col, id_col)
    centroids = _init_centroids(quant, k, id_col)
    for _ in range(iterations):
        centroids = _update(_assign(quant, centroids, id_col), centroids)
    return centroids


def kmeans_assign(df: DataFrame, k: int = 8, iterations: int = 3,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """(id, cluster, dist2) for every row: fit T iterations, then one
    final assignment pass under the fitted centroids. dist2 is the
    exact integer squared distance in the 1e6-scaled space."""
    centroids = kmeans_fit(df, k, iterations, vec_col, id_col)
    quant = _quantize(df, vec_col, id_col)
    return _assign(quant, centroids, id_col).select(
        id_col, "cluster", "dist2")


def kmeans_sizes(df: DataFrame, k: int = 8, iterations: int = 3,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """(cluster, n, mean_dist2) — the cluster-profile rollup."""
    a = kmeans_assign(df, k, iterations, vec_col, id_col)
    return a.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dist2"), 2).alias("mean_dist2"),
    )
