"""ANN recall floors (VERDICT r4 #3): ivf_recall_probe REPORTS
recall@10 for the LSH and IVF paths, but nothing failed if recall
collapsed — a bad hyperplane seed, a broken probe enumeration, or a
centroid-training regression would sail through a green suite. These
tests pin floors at the registry parameters against the sf0.001
fixture. Both paths are fully deterministic (seeded planes;
md5-prefix-sampled + Lloyd-refined centroids), so the measured values
are stable run-to-run and the floors sit just under them.

Context for the absolute numbers: the fixture's embeddings are
STRUCTURELESS — no pair exceeds cosine ~0.61 (see
q_embedding_top_pairs), so the "true neighbors" are barely closer to
the query than random points. Sign-LSH cannot concentrate such
neighbors (measured 0.3 at the registry's 8-plane/radius-2 point, and
only 0.5-0.8 even at aggressive parameters that scan most of the
bucket space), so its floor is a collapse guard, not a quality claim;
IVF with nprobe=6/16 reaches 0.9-1.0 and gets a real floor. On
clustered real-world embeddings both paths do far better — the guard
is that code changes don't silently destroy whatever quality the
parameters buy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hummingbird_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from hummingbird_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_SMOKE, "embeddings").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def query_vec(spark, emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row.embedding]


def _recall_at_10(exact_df, approx_df) -> float:
    exact = {r.vec_id for r in exact_df.select("vec_id").collect()}
    approx = {r.vec_id for r in approx_df.select("vec_id").collect()}
    return len(exact & approx) / len(exact)


def test_lsh_recall_floor(spark, emb, query_vec):
    """Registry parameters (n_planes=8, probe_hamming=2, seed=42).
    Measured 0.3 (deterministic); floor 0.3 = collapse guard — a
    broken bucket computation or probe enumeration lands at 0.0-0.1."""
    exact = cosine_topk(emb, query_vec, k=10)
    approx = lsh_topk(emb, query_vec, k=10, n_planes=8, probe_hamming=2)
    assert _recall_at_10(exact, approx) >= 0.3


def test_ivf_recall_floor(spark, emb, query_vec):
    """Registry parameters (n_centroids=16, nprobe=6). Measured 0.9
    at sf0.001 / 1.0 at sf0.01; floor 0.8 per the r4 verdict ask."""
    exact = cosine_topk(emb, query_vec, k=10)
    approx = ivf_topk(emb, query_vec, k=10, n_centroids=16, nprobe=6)
    assert _recall_at_10(exact, approx) >= 0.8


def test_ivf_recall_with_kmeans_centroids(spark, emb, query_vec):
    """Full-corpus k-means as the IVF quantizer (kmeans_ivf_centroids)
    must clear the same floor as the sample-trained default — the
    wiring contract between cluster.py and similarity.py, plus a
    quality guard on the integer-quantized fit."""
    from hummingbird_spark.operators.cluster import kmeans_ivf_centroids

    cent = kmeans_ivf_centroids(emb, n_centroids=16, iterations=3)
    assert cent.shape == (16, 64)
    exact = cosine_topk(emb, query_vec, k=10)
    approx = ivf_topk(emb, query_vec, k=10, nprobe=6, centroids=cent)
    assert _recall_at_10(exact, approx) >= 0.8


def test_lsh_radius_widens_candidates(spark, emb, query_vec):
    """Monotonicity of the probe enumeration: radius 2 must examine a
    superset of radius 1's candidates (this is the property the
    single-bit-flip bug violated — radius 2 silently equaled 1)."""
    r1 = lsh_topk(emb, query_vec, k=10_000, n_planes=8, probe_hamming=1)
    r2 = lsh_topk(emb, query_vec, k=10_000, n_planes=8, probe_hamming=2)
    ids1 = {r.vec_id for r in r1.collect()}
    ids2 = {r.vec_id for r in r2.collect()}
    assert ids1 <= ids2
    assert len(ids2) > len(ids1)  # the fixture populates radius-2 buckets


def test_recall_probe_registry_query_reports_both_paths(spark):
    """The registry's ivf_recall_probe rides the same parameters as
    the floor tests; its reported numbers must clear the same bars."""
    from hummingbird_spark.plans.queries import QUERIES

    rows = {r.method: r.recall_at_10 for r in
            QUERIES["ivf_recall_probe"].spark(spark, SF_SMOKE).collect()}
    assert rows["lsh"] >= 0.3
    assert rows["ivf"] >= 0.8
