"""Table profiling: per-column statistics in ONE scan.

The migration-assessment step the reference does with collstats +
sampling (workspace/collection stats feeding task sizing) generalized
to column granularity: row count, null count, distinct count
(approximate by default — exact is a full shuffle per column), and
min/max. One wide aggregate computes every measure in a single pass
over the data; the wide row is then unpivoted driver-side (k columns
-> k result rows, no second scan).

At 100 TB: the approx path is one scan with map-side partial
aggregation and a constant-size state per column (HLL + min/max);
exact=True expands to count(distinct) per column — one Expand +
shuffle, the standard cost of exactness. Use approx for assessment,
exact only when the number feeds a correctness decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = False,
                  include_minmax: bool = True) -> DataFrame:
    """-> (column, dtype, n_rows, n_null, n_distinct[, min_value,
    max_value]) — one row per profiled column, computed in one scan.
    min/max are stringified (heterogeneous types in one result column);
    null-only columns yield null min/max."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c))
                        .alias(f"__dist_{c}"))
        if include_minmax:
            aggs.append(F.min(F.col(c)).cast("string")
                        .alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("string")
                        .alias(f"__max_{c}"))

    wide = df.agg(*aggs).collect()[0]  # one row, 4k+1 scalars

    rows = []
    for c in cols:
        row = {
            "column": c, "dtype": dtypes.get(c, ""),
            "n_rows": wide["__n"],
            "n_null": int(wide[f"__null_{c}"] or 0),
            "n_distinct": int(wide[f"__dist_{c}"] or 0),
        }
        if include_minmax:
            row["min_value"] = wide[f"__min_{c}"]
            row["max_value"] = wide[f"__max_{c}"]
        rows.append(row)
    spark = df.sparkSession
    schema = ("column string, dtype string, n_rows long, n_null long, "
              "n_distinct long")
    if include_minmax:
        schema += ", min_value string, max_value string"
    return spark.createDataFrame(rows, schema)


def corpus_report(df, text_col: str = "text",
                  source_col: str = "source",
                  lang_col: str | None = None,
                  id_col: str = "doc_id",
                  dup_substring_min_len: int | None = None) -> dict:
    """One-shot corpus health report for a documents table — the
    numbers a curation run reads first: size, token budget, language
    mix, per-source shares, quality distribution, exact-dup rate.

    Cost: ONE scored projection pass (staged) + three rollups over it
    (global, per-lang, per-source) + the dup-group aggregate. No text
    ever shuffles — only fingerprints, scores, and group keys.

    dup_substring_min_len=N (opt-in: it adds the windows shuffle) also
    reports `dup_substring_token_rate` — the fraction of tokens that a
    Lee-et-al exact-substring pass at that length would remove.
    """
    from pyspark.sql import functions as F

    from hummingbird_spark.functions.text import (
        fingerprint,
        hashed_classifier_score,
        lang_id,
        quality_score,
        token_count,
    )
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    text = F.col(text_col)
    scored = ensure_kernel_parallelism(df).select(
        F.col(source_col).alias("source"),
        token_count(text).alias("n_tok"),
        quality_score(text).alias("quality"),
        (F.col(lang_col) if lang_col else lang_id(text)).alias("lang"),
        fingerprint(text).alias("fp"),
        hashed_classifier_score(text).alias("cls"),
    ).localCheckpoint(eager=False)

    g = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_tok"), 2).alias("avg_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg(F.when(F.col("quality") >= 0.5, 1.0)
                      .otherwise(0.0)), 4).alias("quality_keep_rate"),
        F.round(F.avg(F.when(F.col("cls") >= 0.5, 1.0)
                      .otherwise(0.0)), 4).alias("classifier_keep_rate"),
        F.count_distinct("fp").alias("n_unique"),
    ).first()
    langs = {r.lang: r.n for r in scored.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    sources = {r.source: {"n_docs": r.n, "tokens": r.t}
               for r in scored.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("n_tok").alias("t")).collect()}
    report = {
        "n_docs": g.n_docs,
        "total_tokens": g.total_tokens,
        "avg_tokens": g.avg_tokens,
        "avg_quality": g.avg_quality,
        "quality_keep_rate": g.quality_keep_rate,
        "classifier_keep_rate": g.classifier_keep_rate,
        "exact_dup_rate": round(1 - g.n_unique / g.n_docs, 4)
        if g.n_docs else 0.0,
        "languages": langs,
        "sources": sources,
    }
    if dup_substring_min_len is not None:
        from hummingbird_spark.operators.dedup import (
            duplicate_substring_spans,
        )

        removed = duplicate_substring_spans(
            df, text_col, id_col, min_len=dup_substring_min_len
        ).agg(
            F.coalesce(
                F.sum(F.col("end") - F.col("start") + 1), F.lit(0)
            ).alias("rem")
        ).first().rem
        report["dup_substring_token_rate"] = (
            round(removed / g.total_tokens, 6) if g.total_tokens else 0.0)
    return report
