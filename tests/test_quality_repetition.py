"""Gopher A1.2 repetition filters
(operators/quality_repetition.py): hand-computed fractions on
crafted documents, plus the keep-flag thresholds."""

from __future__ import annotations

from pyspark.sql import Row

from hummingbird_spark.operators.quality_repetition import (
    gopher_repetition_stats,
)


def _stats(spark, text):
    row = gopher_repetition_stats(
        spark.createDataFrame([Row(doc_id=1, text=text)])).head()
    return row.asDict()


def test_clean_document_keeps(spark):
    s = _stats(spark, "the quick brown fox jumps over a lazy dog "
                      "and then sleeps all afternoon long")
    assert s["keep"] == 1
    assert s["dup_line_frac"] == 0.0
    assert s["dup5_char_frac"] == 0.0


def test_duplicate_lines(spark):
    # 4 non-empty lines, "nav menu" twice: 1 duplicate of 4 lines;
    # line chars 8+9+8+7=32, duplicate-occurrence chars 8
    s = _stats(spark, "nav menu\nreal text\nnav menu\ncontent")
    assert s["dup_line_frac"] == 0.25
    assert s["dup_line_char_frac"] == 0.25  # 8/32


def test_top_ngram_fraction_exact(spark):
    # "ab cd ab cd ab": 2-grams = [ab cd, cd ab, ab cd, cd ab] ->
    # tie at count 2; lexicographically largest gram is "cd ab"
    # (len 5): top2 = 2*5/14; 3-grams = [ab cd ab, cd ab cd] twice?
    # no — [ab cd ab, cd ab cd, ab cd ab]: "ab cd ab" count 2,
    # len 8 -> top3 = 16/14 capped by def (can exceed 1 — overlap)
    s = _stats(spark, "ab cd ab cd ab")
    assert s["top2_char_frac"] == round(10 / 14, 6)
    assert s["top3_char_frac"] == round(16 / 14, 6)


def test_keyword_stuffing_trips_keep(spark):
    s = _stats(spark, " ".join(["buy cheap pills now"] * 30))
    assert s["top2_char_frac"] > 0.20
    assert s["dup5_char_frac"] > 0.15
    assert s["keep"] == 0


def test_duplicated_5gram_fraction(spark):
    # two disjoint occurrences of the same 5 tokens, separated by
    # unique filler so only the one 5-gram duplicates
    text = ("one two three four five x1 x2 x3 x4 "
            "one two three four five y1 y2 y3 y4")
    s = _stats(spark, text)
    gram = "one two three four five"
    assert s["dup5_char_frac"] == round(2 * len(gram) / len(text), 6)
    assert s["keep"] == 0  # 46/75 > 0.15


def test_duplicate_paragraphs(spark):
    # 3 paragraphs (split on blank lines), the 10-char one twice:
    # dup_para_frac = 1/3; para chars 10+6+10=26, dup chars 10
    s = _stats(spark,
               "cookie ban\n\nmiddle\n\n\ncookie ban")
    assert s["dup_para_frac"] == round(1 / 3, 6)
    assert s["dup_para_char_frac"] == round(10 / 26, 6)
    # lines (single-newline split) are the same three strings
    assert s["dup_line_frac"] == round(1 / 3, 6)


def test_short_and_empty_docs(spark):
    s = _stats(spark, "one")
    assert s["top2_char_frac"] == 0.0 and s["keep"] == 1
    s = _stats(spark, "")
    assert all(s[k] == 0.0 for k in
               ("dup_line_frac", "dup_line_char_frac",
                "dup_para_frac", "dup_para_char_frac",
                "top2_char_frac", "top3_char_frac",
                "dup5_char_frac"))
    assert s["keep"] == 1
