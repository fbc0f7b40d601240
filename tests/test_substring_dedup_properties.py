"""Differential property test: duplicate_substring_spans /
remove_duplicate_substrings vs a brute-force reference model.

The model enumerates every L-token window, keeps each hash's first
occurrence by (doc_id, start), merges removal intervals, and rebuilds
— the declared Lee-et-al-2021 token-level semantics. Tiny alphabets
force heavy window collisions (self-repeats, cross-doc shares,
overlapping duplicate regions), the regimes where the window-function
pipeline could mis-rank or mis-merge.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hummingbird_spark.operators.dedup import (
    duplicate_substring_spans,
    remove_duplicate_substrings,
)

L = 3  # window length under test

corpora = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0,
             max_size=12),
    min_size=1, max_size=5,
)


def _model(docs: list[list[str]]):
    """-> (merged spans {doc: [(start, end)]}, rebuilt texts {doc: str})
    with 1-based inclusive token positions."""
    first: dict[tuple, tuple] = {}
    order = []
    for did, ws in enumerate(docs):
        for s in range(1, len(ws) - L + 2):
            order.append((did, s, tuple(ws[s - 1:s + L - 1])))
    for did, s, win in order:
        if win not in first or (did, s) < first[win]:
            first[win] = (did, s)
    removal: dict[int, list] = {}
    for did, s, win in order:
        if first[win] != (did, s):
            removal.setdefault(did, []).append((s, s + L - 1))
    spans = {}
    for did, ivs in removal.items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        spans[did] = merged
    rebuilt = {}
    for did, ws in enumerate(docs):
        if did not in spans:
            rebuilt[did] = " ".join(ws)  # original text, see below
            continue
        covered = {
            p for s, e in spans[did] for p in range(s, e + 1)}
        rebuilt[did] = " ".join(
            w for i, w in enumerate(ws, start=1) if i not in covered)
    return spans, rebuilt


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora)
def test_substring_spans_and_rebuild_match_model(spark, docs):
    # single-space join makes "original text" == token re-join, so the
    # untouched-doc byte-identity path and the model coincide exactly
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string")
    want_spans, want_text = _model(docs)

    got_spans: dict[int, list] = {}
    for r in duplicate_substring_spans(df, min_len=L).collect():
        got_spans.setdefault(r.doc_id, []).append((r.start, r.end))
    assert {d: sorted(v) for d, v in got_spans.items()} == want_spans

    got_text = {r.doc_id: r.text
                for r in remove_duplicate_substrings(
                    df, min_len=L).collect()}
    assert got_text == want_text
