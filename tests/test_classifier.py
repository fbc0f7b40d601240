"""Quantized-GD hashed-bag logistic regression (operators/classifier.py):
differential vs a pure-Python replay of the published update rule,
learnability on a separable corpus, partition invariance of the
integer trajectory, and the zero-token scoring edge."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from hummingbird_spark.operators.classifier import (
    SCALE,
    _round_half_away,
    score_hashed_logreg,
    train_and_score,
    train_hashed_logreg,
)


def _py_bucket(tok: str, buckets: int, salt: str) -> int:
    h = hashlib.md5((salt + tok.lower()).encode()).hexdigest()
    return int(h[:15], 16) % buckets


def _py_train(rows, buckets, iterations, lr, salt):
    """Pure-Python replay of the exact quantized algorithm."""
    docs = []
    for _id, text, y in rows:
        toks = text.split()
        if not toks:
            continue
        cnts: dict[int, int] = {}
        for t in toks:
            b = _py_bucket(t, buckets, salt)
            cnts[b] = cnts.get(b, 0) + 1
        docs.append((cnts, len(toks), y))
    w = [0] * (buckets + 1)
    n = len(docs)
    if n == 0:
        return w
    for _ in range(iterations):
        grads = [0] * (buckets + 1)
        for cnts, ln, y in docs:
            zs = sum(c * w[b] for b, c in cnts.items()) + ln * w[buckets]
            z = zs / (ln * float(SCALE))
            p = round(1.0 / (1.0 + math.exp(-z)), 6)
            r = _round_half_away((y - p) * SCALE)
            for b, c in cnts.items():
                grads[b] += _round_half_away(c * r / ln)
            grads[buckets] += r
        for b in range(buckets + 1):
            w[b] += _round_half_away(lr * grads[b] / n)
    return w


SEP_ROWS = [
    (i,
     ("good clean prose sentence " if i % 2 == 0
      else "zz9 qqx7 garbled j4k ") * 6 + f"tail{i}",
     1 if i % 2 == 0 else 0)
    for i in range(80)
]


def test_trained_weights_match_python_replay(spark):
    df = spark.createDataFrame(SEP_ROWS, "doc_id long, text string, y long")
    got = train_hashed_logreg(df, F.col("y") == 1, buckets=32,
                              iterations=4, lr=0.5)
    want = _py_train(SEP_ROWS, buckets=32, iterations=4, lr=0.5,
                     salt="qcls-v1")
    assert got == want  # integer trajectory: EXACT equality


def test_learns_separable_corpus(spark):
    df = spark.createDataFrame(SEP_ROWS, "doc_id long, text string, y long")
    scored = train_and_score(df, F.col("y") == 1, buckets=32,
                             iterations=8, lr=2.0).collect()
    pos = [r.score for r in scored if r.label == 1]
    neg = [r.score for r in scored if r.label == 0]
    # perfect separation on a linearly separable hashed bag
    assert min(pos) > max(neg)
    # AUC == 1.0 via rank-sum
    ranked = sorted(scored, key=lambda r: r.score)
    ranks = {r.doc_id: i + 1 for i, r in enumerate(ranked)}
    rank_sum = sum(ranks[r.doc_id] for r in scored if r.label == 1)
    auc = (rank_sum - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
    assert auc == 1.0


def test_partition_invariant_trajectory(spark):
    df = spark.createDataFrame(SEP_ROWS, "doc_id long, text string, y long")
    w1 = train_hashed_logreg(df.repartition(1), F.col("y") == 1,
                             buckets=16, iterations=3)
    w17 = train_hashed_logreg(df.repartition(17), F.col("y") == 1,
                              buckets=16, iterations=3)
    assert w1 == w17


def test_zero_token_docs_score_half(spark):
    df = spark.createDataFrame(
        [(1, "some words here", 1), (2, "", 0), (3, "   ", 1)],
        "doc_id long, text string, y long")
    w = train_hashed_logreg(df, F.col("y") == 1, buckets=8, iterations=2)
    rows = {r.doc_id: r.score
            for r in score_hashed_logreg(df, w, buckets=8).collect()}
    assert rows[2] == 0.5 and rows[3] == 0.5
    assert len(rows) == 3
