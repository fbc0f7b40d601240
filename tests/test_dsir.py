"""DSIR importance resampling (operators/dsir.py).

Semantic checks a hash-match oracle can't express: weights actually
rank target-like docs above off-target ones; the Gumbel-max sampler
is a real without-replacement sampler (deterministic per seed,
seed-sensitive, importance-biased)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hummingbird_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    gumbel_key,
)


def _corpus(spark):
    """10 target docs about one topic, 10 raw docs about another, and
    2 'bridge' raw docs written in the target's vocabulary."""
    rows = []
    for i in range(10):
        rows.append((i, f"alpha beta gamma delta alpha beta tok{i}", "tgt"))
    for i in range(10, 20):
        rows.append((i, f"zeta eta theta iota kappa zeta eta tok{i}", "raw"))
    rows.append((20, "alpha beta gamma delta alpha beta bridge", "raw"))
    rows.append((21, "alpha beta gamma alpha beta gamma alpha", "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_target_like_docs_score_higher(spark):
    d = _corpus(spark)
    w = {r["doc_id"]: r["log_w"]
         for r in dsir_log_weights(d, F.col("grp") == "tgt",
                                   buckets=512).collect()}
    bridge = min(w[20], w[21])
    off_target = max(w[i] for i in range(10, 20))
    assert bridge > off_target, (bridge, off_target)


def test_empty_doc_scores_zero(spark):
    d = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, ""), (2, "   ")],
        "doc_id long, text string")
    w = {r["doc_id"]: r["log_w"]
         for r in dsir_log_weights(d, F.col("doc_id") == 0,
                                   buckets=64).collect()}
    assert w[1] == 0.0 and w[2] == 0.0
    assert len(w) == 3  # gram-less docs are kept, not dropped


def test_select_deterministic_and_seed_sensitive(spark):
    d = _corpus(spark)
    tgt = F.col("grp") == "tgt"
    a1 = [r["doc_id"] for r in
          dsir_select(d, tgt, k=8, buckets=512, seed="s1").collect()]
    a2 = [r["doc_id"] for r in
          dsir_select(d, tgt, k=8, buckets=512, seed="s1").collect()]
    b = [r["doc_id"] for r in
         dsir_select(d, tgt, k=8, buckets=512, seed="s2").collect()]
    assert a1 == a2                      # reproducible
    assert len(set(a1)) == 8             # without replacement
    assert a1 != b                       # noise actually depends on seed


def test_selection_is_importance_biased(spark):
    """Across many seeds, target-like docs must be selected far more
    often than off-target docs (the Gumbel-max guarantee)."""
    d = _corpus(spark).localCheckpoint()
    tgt = F.col("grp") == "tgt"
    like = 0
    total = 0
    for s in range(8):
        ids = [r["doc_id"] for r in
               dsir_select(d, tgt, k=6, buckets=512,
                           seed=f"seed{s}").collect()]
        like += sum(1 for i in ids if i <= 9 or i >= 20)
        total += len(ids)
    assert like / total > 0.8, like / total


def test_gumbel_key_is_standard_gumbel_shaped(spark):
    """Derived noise should look like Gumbel(0,1): the median of
    n draws ~ -ln(ln 2) ≈ 0.3665, and all draws are finite."""
    n = 4000
    g = (spark.range(n)
         .select(gumbel_key(F.col("id"), "probe").alias("g"))
         .collect())
    vals = sorted(r["g"] for r in g)
    assert all(math.isfinite(v) for v in vals)
    med = vals[n // 2]
    assert abs(med - 0.3665) < 0.06, med
    # Gumbel mean = Euler–Mascheroni ≈ 0.5772
    assert abs(sum(vals) / n - 0.5772) < 0.08


def test_weights_match_local_reference(spark):
    """Differential test: the Spark pipeline equals a pure-Python
    reimplementation of the published scoring on a small corpus."""
    import hashlib

    d = _corpus(spark)
    B, alpha = 256, 0.5

    rows = d.collect()

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    def grams(text: str) -> list:
        ws = [w.lower() for w in text.split()]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    raw: dict = {}
    tgt: dict = {}
    per_doc: dict = {}
    for r in rows:
        cnts: dict = {}
        for gm in grams(r["text"]):
            cnts[bucket(gm)] = cnts.get(bucket(gm), 0) + 1
        per_doc[r["doc_id"]] = cnts
        for b, c in cnts.items():
            raw[b] = raw.get(b, 0) + c
            if r["grp"] == "tgt":
                tgt[b] = tgt.get(b, 0) + c
    raw_tot, tgt_tot = sum(raw.values()), sum(tgt.values())
    expected = {}
    for did, cnts in per_doc.items():
        s = 0.0
        for b, c in cnts.items():
            lw = (math.log((tgt.get(b, 0) + alpha)
                           / (tgt_tot + alpha * B))
                  - math.log((raw[b] + alpha) / (raw_tot + alpha * B)))
            s += c * lw
        expected[did] = round(s, 6)

    got = {r["doc_id"]: r["log_w"]
           for r in dsir_log_weights(d, F.col("grp") == "tgt",
                                     buckets=B).collect()}
    for did, exp in expected.items():
        assert got[did] == pytest.approx(exp, abs=1e-6), did


def _paths_equal(spark, corpus, k, **kw):
    from hummingbird_spark.operators.dsir import dsir_select_distributed

    tgt = F.col("grp") == "tgt"
    exact = dsir_select(corpus, tgt, k=k, buckets=512,
                        seed="eq").collect()
    dist = (dsir_select_distributed(corpus, tgt, k=k, buckets=512,
                                    seed="eq", **kw)
            .orderBy(F.desc("gumbel_score"), "doc_id").collect())
    assert [tuple(r) for r in dist] == [tuple(r) for r in exact]


def test_distributed_selection_equals_limit_path(spark):
    """The huge-k quantile-cutoff path returns EXACTLY the limit-k
    rows — trim_cap=0 forces the refinement loop + bottom anti-join
    even on a tiny corpus; the second run's coarse relative_error is
    clamped by the adaptive per-pass eps (trim_cap/(6m)), pinning that
    the clamp itself preserves the answer."""
    d = _corpus(spark).localCheckpoint()
    # trim_cap=0 means ANY final sliver exceeds the cap — the
    # above-target warning is the documented behavior here, so assert
    # it rather than leak it into the green run's output.
    with pytest.warns(RuntimeWarning, match="exceeds trim_cap"):
        _paths_equal(spark, d, k=8, relative_error=0.05, trim_cap=0)
    _paths_equal(spark, d, k=8, relative_error=0.4, trim_cap=3)


def test_distributed_selection_k_ge_n(spark):
    from hummingbird_spark.operators.dsir import dsir_select_distributed

    d = _corpus(spark)
    out = dsir_select_distributed(d, F.col("grp") == "tgt", k=10_000,
                                  buckets=512, seed="eq")
    assert out.count() == d.count()  # whole corpus, no trim
