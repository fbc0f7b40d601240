"""Misra-Gries heavy hitters: the two-pass exact operator's guarantee
and determinism under adversarial partitioning and skew (where the
bounded counters actually overflow), a pure-Python differential for
the per-partition fold's mergeable-summaries semantics, and the
continuous streaming summary's invariants + replay idempotency."""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.functions.text import tokens
from hummingbird_spark.operators.sketch import mg_candidates, mg_heavy_hitters

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _zipf_corpus(n_docs: int = 300, vocab: int = 500) -> list[tuple[int, str]]:
    """Deterministic skewed corpus: doc i repeats hot tokens with
    frequency ~ 1/rank plus a long unique tail, so the vocabulary far
    exceeds any reasonable k and the MG overflow path really runs."""
    docs = []
    for i in range(n_docs):
        words = []
        for rank in range(1, 12):
            if i % rank == 0:
                words += [f"hot{rank:02d}"] * (12 - rank)
        words += [f"tail{(i * 7 + j) % vocab}" for j in range(20)]
        docs.append((i, " ".join(words)))
    return docs


def _exact_hitters(rows, k):
    c = Counter()
    for _, text in rows:
        c.update(w.lower() for w in text.split())
    n = sum(c.values())
    return sorted(((t, v) for t, v in c.items() if v * (k + 1) > n),
                  key=lambda tv: (-tv[1], tv[0])), n


def test_two_pass_exact_and_partition_invariant(spark):
    rows = _zipf_corpus()
    exact, n = _exact_hitters(rows, k=12)
    assert exact, "fixture must produce non-trivial heavy hitters"
    df = spark.createDataFrame(rows, SCHEMA)
    results = []
    for parts in (1, 7, 32):
        got = [(r.tok, r.cnt)
               for r in mg_heavy_hitters(df.repartition(parts),
                                         k=12).collect()]
        results.append(got)
    assert results[0] == results[1] == results[2] == exact


def test_candidates_superset_and_bounded(spark):
    rows = _zipf_corpus()
    exact, n = _exact_hitters(rows, k=12)
    df = spark.createDataFrame(rows, SCHEMA).repartition(8)
    summary = mg_candidates(df, k=12).collect()
    cands = {r.tok for r in summary if r.tok is not None}
    # bounded state: <= k survivors per partition
    assert len(cands) <= 8 * 12
    # overflow really fired: the 500+-type vocabulary was pruned
    assert len(cands) < 200
    # superset guarantee under skew
    assert {t for t, _ in exact} <= cands
    # sentinel weights recover the exact stream length
    assert sum(r.wt for r in summary) == n


def test_fold_matches_pure_python_mg(spark):
    """One partition, known order: the Arrow fold's surviving counters
    equal a literal weighted Misra-Gries over the same token stream
    (merge form: add, subtract the (k+1)-th largest, drop <= 0)."""
    rows = _zipf_corpus(n_docs=60)
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    got = {r.tok for r in mg_candidates(df, k=10).collect()
           if r.tok is not None}

    stream = []
    for r in (df.select(F.explode(tokens(F.col("text"))).alias("w"))
              .select(F.lower("w").alias("tok")).collect()):
        stream.append(r.tok)
    state: Counter = Counter()
    # the fold merges per Arrow batch; with one partition and default
    # batch size the whole stream is a handful of batches — replicate
    # at whole-stream grain, which the merge algebra makes equivalent
    # only in guarantee, so compare against the batch grain directly
    from hummingbird_spark.session import get_spark

    batch = int(get_spark().conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"))
    for i in range(0, len(stream), batch):
        state.update(stream[i:i + batch])
        if len(state) > 10:
            d = sorted(state.values(), reverse=True)[10]
            state = Counter({t: v - d for t, v in state.items()
                             if v > d})
    assert got == set(state)


def test_streaming_summary_guarantees_and_replay(spark, tmp_path):
    from hummingbird_spark.streaming.sketch import (
        read_topk,
        start_continuous_topk,
        topk_meta,
    )

    rows = _zipf_corpus(n_docs=240)
    src = str(tmp_path / "in")
    summ = str(tmp_path / "topk")
    os.makedirs(src)
    for b in range(3):
        with open(os.path.join(src, f"{b}.json"), "w") as fh:
            for doc_id, text in rows[b * 80:(b + 1) * 80]:
                fh.write(json.dumps({"doc_id": doc_id, "text": text})
                         + "\n")

    q = start_continuous_topk(spark, src, summ, SCHEMA, k=12)
    q.awaitTermination(180)

    true = Counter()
    for _, text in rows:
        true.update(w.lower() for w in text.split())
    n = sum(true.values())

    state = {r.tok: r.cnt for r in read_topk(spark, summ).collect()}
    meta = topk_meta(summ)
    assert meta["n"] == n
    assert len(state) <= 12
    for tok, cnt in state.items():
        # one-sided: stored count never exceeds the true count, and
        # undershoots by at most n/(k+1)
        assert cnt <= true[tok]
        assert true[tok] - cnt <= n / 13
    for tok, cnt in true.items():
        if cnt * 13 > n:
            assert tok in state, f"heavy hitter {tok} evicted"

    # replay: restarting over the same source is a no-op (ledger)
    q = start_continuous_topk(spark, src, summ, SCHEMA, k=12)
    q.awaitTermination(180)
    state2 = {r.tok: r.cnt for r in read_topk(spark, summ).collect()}
    assert state2 == state
    assert topk_meta(summ)["n"] == n


def test_grouped_two_pass_exact_under_skew(spark):
    from hummingbird_spark.operators.sketch import mg_heavy_hitters_grouped

    # per-group Zipf-ish streams with group-DIFFERENT hot tokens and a
    # long unique tail (vocab >> k, so per-group pruning really fires);
    # one dominant group holds 80% of all rows
    rows = []
    i = 0
    for g, n_docs in (("big", 240), ("mid", 40), ("tiny", 20)):
        for j in range(n_docs):
            words = []
            for rank in range(1, 9):
                if j % rank == 0:
                    words += [f"{g}hot{rank}"] * (9 - rank)
            words += [f"{g}tail{(j * 13 + t) % 300}" for t in range(15)]
            rows.append((i, g, " ".join(words)))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    c = Counter()
    ns: dict = {}
    for _, g, text in rows:
        for w in text.split():
            c[(g, w.lower())] += 1
            ns[g] = ns.get(g, 0) + 1
    exact = sorted(
        ((g, t, v) for (g, t), v in c.items() if v * 9 > ns[g]),
        key=lambda x: (x[0], -x[2], x[1]))
    assert exact, "fixture must produce per-group heavy hitters"

    for parts in (1, 7, 32):
        got = [(r.source, r.tok, r.cnt)
               for r in mg_heavy_hitters_grouped(
                   df.repartition(parts), "source", k=8).collect()]
        assert got == exact


def test_topk_sentinel_is_atomic_with_counters(spark, tmp_path):
    """The stream weight n rides INSIDE the summary parquet as a
    tok=NULL sentinel (one atomic swap with the counters). A replayed
    batch without ledger protection double-adds counts AND n together,
    so the advertised [c, c + n/(k+1)] bound stays coherent."""
    from collections import Counter

    from hummingbird_spark.operators.sketch import token_counts
    from hummingbird_spark.streaming.sketch import (
        merge_topk_batch,
        read_topk,
        topk_meta,
    )

    summ = str(tmp_path / "topk")
    rows = _zipf_corpus(n_docs=60)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tc = token_counts(df)

    merge_topk_batch(spark, tc, summ, k=8)
    true = Counter()
    for _, text in rows:
        true.update(w.lower() for w in text.split())
    n = sum(true.values())
    # the sentinel is the ONLY NULL row and holds exactly n
    raw = spark.read.parquet(summ).collect()
    nulls = [r for r in raw if r.tok is None]
    assert len(nulls) == 1 and nulls[0].cnt == n
    assert topk_meta(summ) == {"n": n, "k": 8}
    assert all(r.tok is not None
               for r in read_topk(spark, summ).collect())

    # unprotected replay: counts and n double TOGETHER, so the MG
    # bound still holds against the doubled stream
    merge_topk_batch(spark, tc, summ, k=8)
    meta2 = topk_meta(summ)
    assert meta2["n"] == 2 * n
    state = {r.tok: r.cnt for r in read_topk(spark, summ).collect()}
    for tok, cnt in state.items():
        assert cnt <= 2 * true[tok]
        assert 2 * true[tok] - cnt <= meta2["n"] / 9


def test_topk_pre_sentinel_store_migrates(spark, tmp_path):
    """A summary written by the pre-sentinel format (no tok=NULL row,
    stream weight n in the .meta sidecar) must not read n=0 after the
    upgrade: topk_meta falls back to the sidecar, and the first merge
    folds the sidecar weight into the new sentinel so the advertised
    [c, c + n/(k+1)] bound stays correct."""
    import shutil

    from hummingbird_spark.operators.sketch import token_counts
    from hummingbird_spark.streaming.sketch import (
        merge_topk_batch,
        read_topk,
        topk_meta,
    )

    rows = _zipf_corpus(n_docs=80)
    summ = str(tmp_path / "topk")
    df_a = spark.createDataFrame(rows[:40], SCHEMA)
    df_b = spark.createDataFrame(rows[40:], SCHEMA)
    tc_a, tc_b = token_counts(df_a), token_counts(df_b)
    n_a = tc_a.agg(F.sum("cnt")).collect()[0][0]
    n_b = tc_b.agg(F.sum("cnt")).collect()[0][0]

    # build a legacy-layout store: counters only, n in the sidecar
    merge_topk_batch(spark, tc_a, summ, k=8)
    legacy = (spark.read.parquet(summ)
              .filter(F.col("tok").isNotNull()).collect())
    shutil.rmtree(summ)
    spark.createDataFrame(legacy, "tok string, cnt long") \
        .write.parquet(summ)
    with open(summ + ".meta", "w") as fh:
        json.dump({"k": 8, "n": int(n_a)}, fh)

    # read path: no sentinel -> sidecar fallback, not n=0
    assert topk_meta(summ) == {"n": n_a, "k": 8}

    # merge path: the sidecar weight folds into the new sentinel
    merge_topk_batch(spark, tc_b, summ, k=8)
    meta = topk_meta(summ)
    assert meta["n"] == n_a + n_b
    true = Counter()
    for _, text in rows:
        true.update(w.lower() for w in text.split())
    state = {r.tok: r.cnt for r in read_topk(spark, summ).collect()}
    for tok, cnt in state.items():
        assert cnt <= true[tok]
        assert true[tok] - cnt <= meta["n"] / 9
