"""Gopher repetition filters (Rae et al. 2021, Appendix A1.2 — the
published 'repetitious text' table). Complements the A1.1 quality
rules in functions/text.py::gopher_quality_flags: those score word
and line SHAPE; these measure self-repetition, the signal that
catches boilerplate mirrors, keyword-stuffed spam, and degenerate
generations.

Per document:
  dup_line_frac       duplicate lines / lines (first occurrence is
                      not a duplicate)
  dup_line_char_frac  characters inside duplicate line OCCURRENCES /
                      total line characters
  dup_para_frac       same pair over PARAGRAPHS (blank-line-separated
  dup_para_char_frac  blocks, split on 2+ newlines)
  top2_char_frac      characters covered by the most frequent 2-gram
                      (count x gram length) / total characters; a
                      top gram occurring only once contributes 0
                      (shortness is not repetition)
  top3_char_frac      same for 3-grams
  dup5_char_frac      characters covered by ALL occurrences of
                      duplicated 5-grams / total characters
  keep                none of the paper's thresholds tripped
                      (0.30 / 0.20 / 0.30 / 0.20 / 0.20 / 0.18 /
                      0.15)

Documented subset: the paper's table spans top 2/3/4-grams and
duplicated 5..10-grams; this ships top {2,3} and duplicated {5} —
one representative of each rule family. The remaining n values are
the IDENTICAL plan shape (another grams(n) branch each) and add a
shuffle per n; widen when a corpus shows tail n-gram spam the n=5
rule misses.

Scale shape: line fractions are array-only (zero shuffle, ride the
scan). The n-gram modes use explode + groupBy(doc_id, gram) + a
per-doc max — the composite key spreads evenly under hashing (no key
can exceed one document's grams), the per-doc reduction is map-side
partial, and cost is O(words) per doc. The tempting array-lambda
formulation (count each gram with list_filter) is O(words²) per doc —
quadratic at 10k-token documents, ruled out. Character fractions are
defined over length(text); most-frequent ties break to the
lexicographically LARGEST gram (max(struct(count, gram)) here,
ORDER BY c DESC, g DESC in the SQL oracle — identical order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hummingbird_spark.functions.text import tokens

THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_frac": 0.30,
    "dup_para_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "dup5_char_frac": 0.15,
}


def _frac(num: Column, den: Column) -> Column:
    return F.round(
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double")), 6)


def gopher_repetition_stats(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(id, text) -> the per-document repetition fractions + keep.
    See the module docstring for definitions and the scale shape."""
    base = df.select(
        F.col(id_col), F.col(text_col).alias("__text"),
        tokens(F.col(text_col)).alias("__ws"),
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), F.trim),
            lambda ln: F.length(ln) > 0).alias("__ln"),
        F.filter(
            F.transform(F.split(F.col(text_col), r"\n{2,}"), F.trim),
            lambda p: F.length(p) > 0).alias("__pg"),
    ).localCheckpoint(eager=True)  # three gram branches + line stats

    def grams(n: int) -> DataFrame:
        ws = F.col("__ws")
        g = F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + j + 1).cast("int"))
                       for j in range(n)]),
        )
        gcol = F.when(F.size(ws) >= n, g) \
            .otherwise(F.array().cast("array<string>"))
        return (base.select(id_col, F.explode(gcol).alias("g"))
                .groupBy(id_col, "g")
                .agg(F.count(F.lit(1)).alias("c")))

    def top_chars(n: int, name: str) -> DataFrame:
        # a top gram that occurs ONCE is document shortness, not
        # repetition — it contributes 0 (documented choice; without
        # it every sub-~20-word document trips the 3-gram threshold
        # on its only phrase)
        t = grams(n).groupBy(id_col).agg(
            F.max(F.struct(F.col("c"), F.col("g"))).alias("t"))
        return t.select(
            id_col,
            F.when(F.col("t.c") >= 2,
                   F.col("t.c") * F.length("t.g"))
            .otherwise(F.lit(0)).alias(name))

    top2 = top_chars(2, "__top2")
    top3 = top_chars(3, "__top3")
    dup5 = (grams(5).filter(F.col("c") > 1).groupBy(id_col)
            .agg(F.sum(F.col("c") * F.length("g")).alias("__dup5")))

    n_ln = F.size("__ln")
    dln = F.array_distinct(F.col("__ln"))
    lc = F.aggregate(F.col("__ln"), F.lit(0),
                     lambda a, x: a + F.length(x))
    dlc = F.aggregate(dln, F.lit(0), lambda a, x: a + F.length(x))
    n_pg = F.size("__pg")
    dpg = F.array_distinct(F.col("__pg"))
    pc = F.aggregate(F.col("__pg"), F.lit(0),
                     lambda a, x: a + F.length(x))
    dpc = F.aggregate(dpg, F.lit(0), lambda a, x: a + F.length(x))
    nchars = F.length("__text")

    return (
        base.join(top2, id_col, "left")
        .join(top3, id_col, "left")
        .join(dup5, id_col, "left")
        .select(
            id_col,
            _frac(n_ln - F.size(dln), n_ln).alias("dup_line_frac"),
            _frac(lc - dlc, lc).alias("dup_line_char_frac"),
            _frac(n_pg - F.size(dpg), n_pg).alias("dup_para_frac"),
            _frac(pc - dpc, pc).alias("dup_para_char_frac"),
            _frac(F.coalesce("__top2", F.lit(0)), nchars)
            .alias("top2_char_frac"),
            _frac(F.coalesce("__top3", F.lit(0)), nchars)
            .alias("top3_char_frac"),
            _frac(F.coalesce("__dup5", F.lit(0)), nchars)
            .alias("dup5_char_frac"),
        )
        .select(
            "*",
            ((F.col("dup_line_frac") <= THRESHOLDS["dup_line_frac"])
             & (F.col("dup_line_char_frac")
                <= THRESHOLDS["dup_line_char_frac"])
             & (F.col("dup_para_frac") <= THRESHOLDS["dup_para_frac"])
             & (F.col("dup_para_char_frac")
                <= THRESHOLDS["dup_para_char_frac"])
             & (F.col("top2_char_frac") <= THRESHOLDS["top2_char_frac"])
             & (F.col("top3_char_frac") <= THRESHOLDS["top3_char_frac"])
             & (F.col("dup5_char_frac") <= THRESHOLDS["dup5_char_frac"]))
            .cast("int").alias("keep"),
        )
    )
