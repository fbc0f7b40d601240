"""Graph operators: integer-trajectory PageRank + deterministic label
propagation vs pure-Python references, partition invariance, and the
df-capped edge builder."""

from __future__ import annotations

from pyspark.sql import functions as F

from hummingbird_spark.operators.graph import (
    label_propagation,
    pagerank_scaled,
    rare_trigram_edges,
)

# two triangles joined by a bridge
EDGES = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]


def _ref_pagerank(edges, rounds, damping=85, scale=1_000_000):
    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    deg = {n: len(vs) for n, vs in sym.items()}
    base = scale * (100 - damping) // 100
    r = {n: scale for n in sym}
    for _ in range(rounds):
        nxt = {n: base for n in sym}
        for u, vs in sym.items():
            share = (damping * r[u]) // (100 * deg[u])
            for v in vs:
                nxt[v] += share
        r = nxt
    return r, deg


def _ref_lp(edges, rounds):
    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    lab = {n: n for n in sym}
    for _ in range(rounds):
        nxt = {}
        for n, vs in sym.items():
            cnt = {}
            for v in vs:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
            nxt[n] = min(cnt, key=lambda L: (-cnt[L], L))
        lab = nxt
    return lab


def test_pagerank_matches_reference(spark):
    e = spark.createDataFrame(EDGES, "a long, b long")
    got = {r.node: (r.deg, r.rank_scaled)
           for r in pagerank_scaled(e, rounds=4).collect()}
    ref_r, ref_deg = _ref_pagerank(EDGES, rounds=4)
    assert got == {n: (ref_deg[n], ref_r[n]) for n in ref_r}
    # bridge endpoints (3, 4) have the highest degree and rank
    ranks = {n: rs for n, (_, rs) in got.items()}
    assert min(ranks[3], ranks[4]) > max(
        v for n, v in ranks.items() if n not in (3, 4))


def test_pagerank_partition_invariant(spark):
    e = spark.createDataFrame(EDGES, "a long, b long")
    one = {r.node: r.rank_scaled
           for r in pagerank_scaled(e.coalesce(1), rounds=3).collect()}
    many = {r.node: r.rank_scaled
            for r in pagerank_scaled(e.repartition(7), rounds=3)
            .collect()}
    assert one == many


def test_label_propagation_matches_reference(spark):
    e = spark.createDataFrame(EDGES, "a long, b long")
    got = {r.node: r.community
           for r in label_propagation(e, rounds=3).collect()}
    assert got == _ref_lp(EDGES, rounds=3)
    # the two triangles resolve to different label sets
    assert {got[1], got[2]} != {got[5], got[6]}


def test_rare_trigram_edges_df_cap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares 'alpha beta gamma'
            (2, "alpha beta gamma epsilon"),    # with doc 1 (df=2)
            (3, "zeta eta theta"),              # unique trigram (df=1)
            (4, "common one two"),              # 'common one two' df=4:
            (5, "common one two"),
            (6, "common one two"),
            (7, "common one two"),
        ],
        "doc_id long, text string",
    )
    got = {(r.a, r.b) for r in rare_trigram_edges(docs).collect()}
    # df=2 pair kept; df=1 isolated; df=4 within [2,5] -> full clique
    assert (1, 2) in got
    assert all(3 not in pair for pair in got)
    clique = {(a, b) for a in (4, 5, 6, 7) for b in (4, 5, 6, 7) if a < b}
    assert clique <= got
    # df cap: with max_df=3 the 4-doc clique disappears
    got3 = {(r.a, r.b)
            for r in rare_trigram_edges(docs, max_df=3).collect()}
    assert not (clique & got3) and (1, 2) in got3


def test_graph_ops_match_reference_on_random_graphs(spark):
    """Property check across random graph shapes (star, chain, dense,
    disconnected): both iterative operators equal their pure-Python
    references — the integer trajectories leave no room for 'close'."""
    import random

    rng = random.Random(7)
    cases = []
    # star
    cases.append([(0, i) for i in range(1, 9)])
    # chain (worst diameter for 3-4 rounds — still must match the
    # reference exactly at the SAME round count)
    cases.append([(i, i + 1) for i in range(10)])
    # two disconnected triangles + random extras
    for _ in range(3):
        n = rng.randint(6, 14)
        edges = {(a, b)
                 for _ in range(rng.randint(n, 3 * n))
                 for a, b in [sorted(rng.sample(range(n), 2))]}
        cases.append(sorted(edges))

    for edges in cases:
        e = spark.createDataFrame(edges, "a long, b long")
        got_pr = {r.node: (r.deg, r.rank_scaled)
                  for r in pagerank_scaled(e, rounds=3).collect()}
        ref_r, ref_deg = _ref_pagerank(edges, rounds=3)
        assert got_pr == {n: (ref_deg[n], ref_r[n]) for n in ref_r}, edges
        got_lp = {r.node: r.community
                  for r in label_propagation(e, rounds=2).collect()}
        assert got_lp == _ref_lp(edges, rounds=2), edges


def _ref_trustrank(edges, seeds, rounds, damping=85, scale=1_000_000):
    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    deg = {n: len(vs) for n, vs in sym.items()}
    base = scale * (100 - damping) // 100
    in_graph_seeds = set(seeds) & set(sym)
    r = {n: (scale if n in in_graph_seeds else 0) for n in sym}
    for _ in range(rounds):
        nxt = {n: (base if n in in_graph_seeds else 0) for n in sym}
        for u, vs in sym.items():
            share = (damping * r[u]) // (100 * deg[u])
            for v in vs:
                nxt[v] += share
        r = nxt
    return r


def test_trustrank_matches_reference_and_reduces_to_pagerank(spark):
    e = spark.createDataFrame(EDGES, "a long, b long")
    # seed node 7 does not exist in the graph -> silently ignored
    seeds = spark.createDataFrame([(1,), (7,)], "doc_id long")
    got = {r.node: r.rank_scaled
           for r in pagerank_scaled(e, rounds=4,
                                    seeds=seeds).collect()}
    assert got == _ref_trustrank(EDGES, {1, 7}, rounds=4)
    # mass concentrates near the seed's triangle
    assert got[2] > got[5] and got[1] > 0 and got[6] >= 0
    # seeding EVERY node reduces to uniform PageRank exactly
    all_seeds = spark.createDataFrame(
        [(n,) for n in range(1, 7)], "doc_id long")
    seeded_all = {r.node: r.rank_scaled
                  for r in pagerank_scaled(e, rounds=3,
                                           seeds=all_seeds).collect()}
    uniform = {r.node: r.rank_scaled
               for r in pagerank_scaled(e, rounds=3).collect()}
    assert seeded_all == uniform


def _ref_weighted_pagerank(wedges, rounds, damping=85,
                           scale=1_000_000):
    sym = {}
    for a, b, w in wedges:
        sym.setdefault(a, []).append((b, w))
        sym.setdefault(b, []).append((a, w))
    W = {n: sum(w for _, w in vs) for n, vs in sym.items()}
    base = scale * (100 - damping) // 100
    r = {n: scale for n in sym}
    for _ in range(rounds):
        nxt = {n: base for n in sym}
        for u, vs in sym.items():
            s = (damping * r[u]) // (100 * W[u])
            for v, w in vs:
                nxt[v] += w * s
        r = nxt
    return r, W


def test_weighted_pagerank_matches_reference_and_reduces(spark):
    wedges = [(1, 2, 5), (2, 3, 1), (1, 3, 2), (3, 4, 1), (4, 5, 7)]
    e = spark.createDataFrame(wedges, "a long, b long, w long")
    got = {r.node: (r.deg, r.rank_scaled)
           for r in pagerank_scaled(e, rounds=3,
                                    weight_col="w").collect()}
    ref_r, ref_w = _ref_weighted_pagerank(wedges, rounds=3)
    assert got == {n: (ref_w[n], ref_r[n]) for n in ref_r}
    # all weights 1 reduces to unweighted EXACTLY
    ones = spark.createDataFrame(
        [(a, b, 1) for a, b, _ in wedges], "a long, b long, w long")
    as_weighted = {r.node: r.rank_scaled
                   for r in pagerank_scaled(ones, rounds=3,
                                            weight_col="w").collect()}
    unweighted = {r.node: r.rank_scaled
                  for r in pagerank_scaled(
                      ones.select("a", "b"), rounds=3).collect()}
    assert as_weighted == unweighted


def test_rare_trigram_edges_weighted_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "p q r s t"),    # shares trigrams 'p q r','q r s',
            (2, "p q r s t u"),  # 'r s t' with doc 2 -> w = 3
            (3, "x y z"),
        ],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.w
           for r in rare_trigram_edges(docs, weighted=True).collect()}
    assert got == {(1, 2): 3}


def test_pagerank_rejects_degenerate_damping(spark):
    e = spark.createDataFrame(EDGES, "a long, b long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="damping_pct"):
        pagerank_scaled(e, rounds=1, damping_pct=100)
