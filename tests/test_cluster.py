"""Distributed k-means (operators/cluster.py): Lloyd invariants,
determinism of the integer trajectory, tie-breaks, empty-cluster carry,
and label coherence on the fixture embeddings."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hummingbird_spark.operators.cluster import (
    SCALE,
    kmeans_assign,
    kmeans_fit,
    kmeans_sizes,
)
from hummingbird_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_assignment_partitions_corpus(spark, emb):
    n = emb.count()
    a = kmeans_assign(emb, k=4, iterations=2)
    rows = a.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert all(0 <= r["cluster"] < 4 for r in rows)
    assert all(r["dist2"] >= 0 for r in rows)


def test_trajectory_is_deterministic(spark, emb):
    a = sorted(map(tuple, kmeans_assign(emb, k=4, iterations=2).collect()))
    b = sorted(map(tuple, kmeans_assign(emb, k=4, iterations=2).collect()))
    assert a == b


def test_lloyd_objective_non_increasing(spark, emb):
    """More Lloyd iterations can only lower the total within-cluster
    squared distance (the classic monotone-convergence guarantee; the
    integer re-rounding perturbs it by at most a quantization epsilon,
    far below the objective's scale)."""
    costs = []
    for t in (1, 2, 4):
        a = kmeans_assign(emb, k=4, iterations=t)
        costs.append(a.agg(F.sum("dist2")).collect()[0][0])
    assert costs[0] >= costs[1] >= costs[2] - costs[2] // 1000


def test_tie_breaks_to_lowest_cluster(spark):
    """Two identical centroids (duplicated seed points): every row is
    equidistant to both and must land in the lower cluster id. The k=2
    md5-order seeds over ids 0..7 are ids 6 and 7 (deterministic), so
    those two rows are made identical."""
    rows = [(i, [float(i), 0.5]) for i in range(6)] + [
        (6, [1.0, 1.0]), (7, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = kmeans_assign(df, k=2, iterations=0)
    assert all(r["cluster"] == 0 for r in a.collect())


def test_identical_points_tie_cluster_zero(spark):
    """All points identical -> both seed centroids identical -> every
    assignment ties and must resolve to cluster 0, with dist2 == 0."""
    df = spark.createDataFrame(
        [(i, [0.25, -0.5, 0.125]) for i in range(6)],
        "vec_id long, embedding array<double>")
    a = kmeans_assign(df, k=2, iterations=2).collect()
    assert all(r["cluster"] == 0 and r["dist2"] == 0 for r in a)


def test_empty_cluster_keeps_previous_centroid(spark):
    """k=3 over two tight far-apart groups: at most two clusters can
    win rows; the empty one's centroid must carry through unchanged
    (no crash, no NaN drift) and the fit must still cover all rows."""
    pts = [(i, [0.0, 0.0]) for i in range(5)] + \
          [(10 + i, [1.0, 1.0]) for i in range(5)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cent = kmeans_fit(df, k=3, iterations=3)
    assert len(cent) == 3
    a = kmeans_assign(df, k=3, iterations=3)
    assert a.count() == 10
    # the two groups must separate perfectly
    by_group = a.withColumn("g", (F.col("vec_id") >= 10).cast("int")) \
        .groupBy("g").agg(F.count_distinct("cluster").alias("c")).collect()
    assert all(r["c"] == 1 for r in by_group)


def test_quantization_scale(spark):
    """Centroids live in the 1e6-scaled integer space."""
    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [0.5, -0.25])],
        "vec_id long, embedding array<double>")
    cent = kmeans_fit(df, k=1, iterations=1)
    assert cent[0] == [int(0.5 * SCALE), int(-0.25 * SCALE)]


def test_differential_vs_reference_lloyd(spark, emb):
    """Single-process numpy replica of the published algorithm (same
    md5 seeding, same integer quantization, same half-away-from-zero
    centroid rounding, same lowest-id tie-break) must produce the
    exact same (cluster, dist2) for every row — the same differential
    discipline the BPE and CC operators use. (The fixture's `label`
    column is NOT geometrically clustered — measured purity ~= the
    1/k random floor — so label purity is not a valid oracle here.)"""
    import hashlib
    import math

    import numpy as np

    k, T = 6, 3
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    xq = {
        r["vec_id"]: np.array(
            [math.floor(v * SCALE + 0.5) if v >= 0
             else -math.floor(-v * SCALE + 0.5)
             for v in (float(x) for x in r["embedding"])],
            dtype=np.int64)
        for r in rows
    }
    seeds = sorted(
        ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:k]
    cent = np.stack([xq[i] for i in seeds])

    def assign(cent):
        out = {}
        for i in ids:
            d2 = ((xq[i] - cent) ** 2).sum(axis=1)
            c = int(d2.argmin())
            out[i] = (c, int(d2[c]))
        return out

    for _ in range(T):
        a = assign(cent)
        sums = np.zeros((k, cent.shape[1]), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for i, (c, _) in a.items():
            sums[c] += xq[i]
            counts[c] += 1
        for c in range(k):
            if counts[c]:
                for d in range(cent.shape[1]):
                    v = sums[c, d] / counts[c]
                    cent[c, d] = (math.floor(v + 0.5) if v >= 0
                                  else -math.floor(-v + 0.5))
    expected = assign(cent)

    got = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_assign(emb, k=k, iterations=T).collect()}
    assert got == expected


def test_sizes_rollup_consistent(spark, emb):
    s = kmeans_sizes(emb, k=4, iterations=2)
    total = s.agg(F.sum("n")).collect()[0][0]
    assert total == emb.count()


def test_cluster_balanced_sample(spark, emb):
    """Exactly min(n_per, cluster size) rows per cluster; the sample
    is a subset of the assignment with matching clusters; the draw is
    deterministic. n_per=10 forces the cutoff FILTER path on the
    ~125-row clusters (n > 4*n_per), so the two-phase selection — not
    just the trivial full-range branch — is what's under test."""
    from hummingbird_spark.operators.cluster import cluster_balanced_sample

    n_per = 10
    assign = {r["vec_id"]: r["cluster"]
              for r in kmeans_assign(emb, k=4, iterations=2).collect()}
    sizes = {}
    for c in assign.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert max(sizes.values()) > 4 * n_per  # filter path is active

    s = cluster_balanced_sample(emb, k=4, n_per_cluster=n_per,
                                iterations=2).collect()
    per = {}
    for r in s:
        assert assign[r["vec_id"]] == r["cluster"]
        per[r["cluster"]] = per.get(r["cluster"], 0) + 1
    assert per == {c: min(n_per, n) for c, n in sizes.items()}

    s2 = cluster_balanced_sample(emb, k=4, n_per_cluster=n_per,
                                 iterations=2).collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, s2))


def test_string_id_column(spark):
    """The mapInPandas output schema derives the id field's type from
    the input frame (r5 advice: a hardcoded `long` broke string/int32
    ids at runtime despite the API accepting any id_col)."""
    rows = [(f"doc-{i}", [float(i % 3), float(i % 5)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = kmeans_assign(df, k=2, iterations=1).collect()
    assert len(out) == 12
    assert all(isinstance(r["vec_id"], str) for r in out)
    assert all(0 <= r["cluster"] < 2 for r in out)


def test_centroid_mean_is_integer_exact_half_away(spark):
    """The Lloyd update rounds the centroid mean half-away-from-zero
    in pure integer arithmetic. Pin the rounding at .5 boundaries for
    both signs (s=+3,n=2 -> 2; s=-3,n=2 -> -2), where a naive
    floor(s/n + 0.5) on doubles agrees but the integer form is what
    both engines now evaluate."""
    from hummingbird_spark.operators.cluster import _update

    # one cluster, dims engineered so per-dim sums hit .5 ratios:
    # dim0 values {1, 2} -> s=3, n=2 -> mean 1.5 -> 2
    # dim1 values {-1, -2} -> s=-3, n=2 -> mean -1.5 -> -2
    assigned = spark.createDataFrame(
        [(1, [1, -1], 0, 0), (2, [2, -2], 0, 0)],
        "vec_id long, __xq array<long>, cluster long, dist2 long")
    out = _update(assigned, [[0, 0]])
    assert out == [[2, -2]]
