"""Interpolated Kneser-Ney trigram LM (operators/search.py):
differential test against a direct pure-Python implementation of the
published equations, plus behavioral sanity (the quality-filter use)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from hummingbird_spark.operators.search import kn_trigram_perplexity

D = 0.75


def _ref_kn(docs: dict[int, str]) -> dict[int, tuple[float, int]]:
    """Chen & Goodman interpolated KN, order 3, single discount D,
    continuation counts below the top order, count hierarchy derived
    from trigram types (matching the operator's documented contract)."""
    tri_occ = defaultdict(Counter)      # doc -> trigram -> count
    c3 = Counter()
    for i, text in docs.items():
        ws = [w.lower() for w in text.split()]
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tg = (a, b, c)
            tri_occ[i][tg] += 1
            c3[tg] += 1
    ctx_tot = Counter()                 # c2(uv) from trigram counts
    ctx_types = Counter()               # N1+(uv.)
    cont = Counter()                    # N1+(.vw): distinct u per (v,w)
    for (u, v, w), c in c3.items():
        ctx_tot[(u, v)] += c
        ctx_types[(u, v)] += 1
        cont[(v, w)] += 1
    mid_tot = Counter()                 # N1+(.v.)
    mid_types = Counter()               # N1+(v.)
    unic = Counter()                    # N1+(.w)
    for (v, w), n in cont.items():
        mid_tot[v] += n
        mid_types[v] += 1
        unic[w] += 1
    nt2 = len(cont)

    out = {}
    for i, grams in tri_occ.items():
        tot_nll, n = 0.0, 0
        for (u, v, w), cnt in grams.items():
            p_cont = unic[w] / nt2
            p2 = (max(cont[(v, w)] - D, 0.0) / mid_tot[v]
                  + D * mid_types[v] / mid_tot[v] * p_cont)
            p3 = (max(c3[(u, v, w)] - D, 0.0) / ctx_tot[(u, v)]
                  + D * ctx_types[(u, v)] / ctx_tot[(u, v)] * p2)
            tot_nll += cnt * -math.log(p3)
            n += cnt
        out[i] = (round(math.exp(tot_nll / n), 4), n)
    return out


@pytest.fixture(scope="module")
def corpus():
    return {
        0: "the cat sat on the mat",
        1: "the dog sat on the mat",
        2: "the cat ate the fish and the cat slept",
        3: "a dog and a cat and a fish",
        4: "colorless green ideas sleep furiously tonight",
        5: "the the the the the",
        6: "one two",          # <3 tokens -> no row
        7: "",                 # empty -> no row
        8: "the cat sat on the mat",   # exact dup of doc 0
    }


def test_differential_vs_published_equations(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["kn_perplexity"], r["n_trigrams"])
           for r in kn_trigram_perplexity(df, discount=D).collect()}
    assert got == _ref_kn(corpus)


def test_short_docs_emit_no_row(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    ids = {r["doc_id"] for r in kn_trigram_perplexity(df).collect()}
    assert 6 not in ids and 7 not in ids and 0 in ids


def test_duplicate_docs_score_identically(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["kn_perplexity"]
           for r in kn_trigram_perplexity(df).collect()}
    assert got[0] == got[8]


def test_in_domain_text_scores_below_gibberish(spark, corpus):
    """The filter premise: text made of corpus-frequent n-grams is
    less perplexing than one-off word salad."""
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["kn_perplexity"]
           for r in kn_trigram_perplexity(df).collect()}
    assert got[0] < got[4]


def _ref_kn_capped(docs, top_k):
    """Reference with the trigram cap: kept = top_k types by
    (count desc, text); pruned types score with c3 treated as 0."""
    c3 = Counter()
    tri_occ = defaultdict(Counter)
    for i, text in docs.items():
        ws = [w.lower() for w in text.split()]
        for tg in zip(ws, ws[1:], ws[2:]):
            tri_occ[i][tg] += 1
            c3[tg] += 1
    kept = set(sorted(c3, key=lambda t: (-c3[t], " ".join(t)))[:top_k])
    ctx_tot, ctx_types, cont = Counter(), Counter(), Counter()
    for (u, v, w), c in c3.items():
        ctx_tot[(u, v)] += c
        ctx_types[(u, v)] += 1
        cont[(v, w)] += 1
    mid_tot, mid_types, unic = Counter(), Counter(), Counter()
    for (v, w), n in cont.items():
        mid_tot[v] += n
        mid_types[v] += 1
        unic[w] += 1
    nt2 = len(cont)
    out = {}
    for i, grams in tri_occ.items():
        tot, n = 0.0, 0
        for (u, v, w), cnt in grams.items():
            p2 = (max(cont[(v, w)] - D, 0.0) / mid_tot[v]
                  + D * mid_types[v] / mid_tot[v] * (unic[w] / nt2))
            if (u, v, w) in kept:
                p3 = (max(c3[(u, v, w)] - D, 0.0) / ctx_tot[(u, v)]
                      + D * ctx_types[(u, v)] / ctx_tot[(u, v)] * p2)
            else:
                p3 = D * ctx_types[(u, v)] / ctx_tot[(u, v)] * p2
            tot += cnt * -math.log(p3)
            n += cnt
        out[i] = (round(math.exp(tot / n), 4), n)
    return out


def test_capped_differential_and_dominance(spark, corpus):
    """top_k=5 forces real pruning: the capped path must match the
    capped reference equations, and capped perplexity >= exact for
    every doc (mass only moves to the backoff term)."""
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["kn_perplexity"], r["n_trigrams"])
           for r in kn_trigram_perplexity(
               df, discount=D, model_top_k=5).collect()}
    assert got == _ref_kn_capped(corpus, 5)
    exact = {r["doc_id"]: r["kn_perplexity"]
             for r in kn_trigram_perplexity(df, discount=D).collect()}
    assert all(got[i][0] >= exact[i] for i in exact)


def test_cap_covering_all_types_equals_exact(spark, corpus):
    """K >= the trigram-type count must be bit-identical to the
    uncapped path (the cap's no-op contract)."""
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    capped = sorted(map(tuple, kn_trigram_perplexity(
        df, discount=D, model_top_k=10_000).collect()))
    exact = sorted(map(tuple, kn_trigram_perplexity(
        df, discount=D).collect()))
    assert capped == exact


def test_probabilities_are_subunit(spark, corpus):
    """Every trigram probability < 1 => perplexity > 1 (a smoothed
    model never assigns certainty)."""
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    assert all(r["kn_perplexity"] > 1.0
               for r in kn_trigram_perplexity(df).collect())
