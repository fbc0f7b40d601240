"""Distributed BPE vs the published algorithm: the Spark trainer must
produce the SAME merge sequence and segmentations as a direct Python
implementation of Sennrich et al.'s procedure on word-type counts."""

from __future__ import annotations

import collections

from pyspark.sql import Row

from hummingbird_spark.operators.bpe import (
    END,
    bpe_token_counts,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _py_bpe(word_counts, n_merges, min_pair_count=2):
    """Reference implementation: count pairs over word types, merge the
    argmax (ties lexicographic), repeat."""
    segs = {w: list(w) + [END] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, n in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w in segs:
            s, out = segs[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_bpe_matches_reference(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])
    # local_vocab_threshold=0 forces the DISTRIBUTED loop — this is
    # the differential test of the fold/aggregate path proper
    merges, seg = train_bpe(df, n_merges=12, local_vocab_threshold=0)

    counts = collections.Counter()
    for t in CORPUS:
        counts.update(t.split())
    ref_merges, ref_segs = _py_bpe(dict(counts), 12)

    assert merges == ref_merges
    got_segs = {r.w: list(r.syms) for r in seg.collect()}
    assert got_segs == ref_segs

    # the default (driver-local below threshold) path must be
    # indistinguishable: same merges, same segmentations, same schema
    merges_l, seg_l = train_bpe(df, n_merges=12)
    assert merges_l == ref_merges
    assert {r.w: list(r.syms) for r in seg_l.collect()} == ref_segs
    assert dict(seg_l.dtypes) == dict(seg.dtypes)

    # encoding: per-doc subword counts match the reference segs
    enc = {r.doc_id: (r.n_bpe_tokens, r.n_words)
           for r in bpe_token_counts(df, seg).collect()}
    for i, t in enumerate(CORPUS):
        want = sum(len(ref_segs[w]) for w in t.split())
        assert enc[i] == (want, len(t.split()))


def test_bpe_learns_frequent_subwords(spark):
    """Sanity: the classic corpus learns 'low' and 'est' units."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])
    merges, seg = train_bpe(df, n_merges=12)
    units = {a + b for a, b in merges}
    assert any("low" in u for u in units)
    assert any("est" in u for u in units)
    # every word's symbols reassemble to word + END marker
    for r in seg.collect():
        assert "".join(r.syms) == r.w + END


def test_bpe_empty_corpus(spark):
    """No words -> no merges, empty segmentation table with the
    standard (w, n, syms) schema."""
    from pyspark.sql import Row as R
    df = spark.createDataFrame([R(doc_id=0, text="")])
    merges, seg = train_bpe(df, n_merges=5)
    assert merges == []
    assert seg.collect() == []
    assert [f.name for f in seg.schema.fields] == ["w", "n", "syms"]
