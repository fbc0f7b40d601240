"""Round-4 registry queries: oracle-grade proofs for the EFFECTFUL
pipelines (bulk copy and CDC decode→fold→apply), closing the r3-verdict
gap where `migration_copy_lineitem` / `cdc_apply_20k_events` were
bench-only with no driver CORRECTNESS row.

Shape: each query RUNS the effectful operator into a session-scoped
temp dir, reads the produced table back, and returns a deterministic
verification frame the driver can hash-match against a pure-SQL oracle
over the SOURCE tables. The result frames are tiny (1 row / ≤499
rows), so they are materialized with a bounded collect and re-created
as a local DataFrame — the temp dir is then removed, keeping the query
side-effect-free from the caller's perspective.

Reference parity: the copy proof mirrors the reference's row-count
verification after a migration (`task.go:88-105` counts written rows);
the CDC proof exercises the full GetWriteModels→ordered-bulk path
(`oplog_utils.go:88-281`) end-to-end against a SQL replay of the same
event stream.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.sources.tables import load_table

R4_QUERIES: dict = {}

_CKSUM_MOD = 1_000_000_007  # keep the bigint sum far from 2^63 at any SF


def q_migration_copy_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the real bulk-copy migration (range-partitioned
    parquet→parquet, operators/copy.py::run_migration) on lineitem into
    a temp target, then prove the TARGET content-equals the source:
    row count, a per-row key checksum (md5 of the (orderkey, linenumber)
    primary key, summed mod a prime), and decimal-exact value sums.
    The oracle computes the same aggregates over the source directly —
    a complete, content-exact copy is the only way they match."""
    from hummingbird_spark.config import Include, MigrationConfig
    from hummingbird_spark.operators.copy import run_migration

    tmp = tempfile.mkdtemp(prefix="hb_copy_verify_")
    try:
        cfg = MigrationConfig(
            command="data-only", source=sf_dir, target=tmp,
            includes=[Include(namespace="lineitem")], key="l_orderkey",
            drop=True,
        )
        report = run_migration(spark, cfg)
        assert report.total_rows > 0
        copied = spark.read.parquet(f"{tmp}/lineitem.parquet")
        key_hash = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(
                        "|",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )), 1, 15),
                16, 10,
            ).cast("long") % _CKSUM_MOD
        )
        row = copied.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(key_hash).alias("key_checksum"),
            # the value columns are doubles in the parquet — sum via
            # decimal so the result is addition-order-independent and
            # hash-exact across engines
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("qty_sum"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").alias("price_sum"),
        ).collect()[0]  # bounded: exactly one row
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType([
        T.StructField("n_rows", T.LongType()),
        T.StructField("key_checksum", T.LongType()),
        T.StructField("qty_sum", T.DoubleType()),
        T.StructField("price_sum", T.DoubleType()),
    ])
    return spark.createDataFrame([row], schema)


ORACLE_MIGRATION_COPY_VERIFY = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(('0x' || substr(md5(
                CAST(l_orderkey AS VARCHAR) || '|' ||
                CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
                % {_CKSUM_MOD}) AS BIGINT) AS key_checksum,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS price_sum
FROM lineitem
"""


R4_QUERIES["migration_copy_verify"] = (
    q_migration_copy_verify, ORACLE_MIGRATION_COPY_VERIFY,
    "bulk-copy migration proven content-exact vs source oracle")


def q_cdc_apply_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the FULL CDC write path — decode_write_models (v4 legacy
    {$set}/replace/delete) → reduce_write_models (per-key ordered fold)
    → apply_cdc_batch (merge into a parquet target) — over a
    deterministic event stream derived from the orders table, then
    return the final target state. The oracle replays the same stream
    in SQL: per key, the last replace-or-delete decides existence, and
    the newest later $set (if any) decides the value. Patches on
    never-inserted keys are no-ops (UpdateOne matches nothing), same as
    `oplog_utils.go:110-197` ordered-bulk semantics.

    Event mapping (one event per order, ts = seq = o_orderkey, key =
    o_orderkey % 499): orderkey ≡ 3 (mod 7) → patch {$set {v}},
    else ≡ 10 (mod 11) → delete, else → insert {_id, v=o_orderkey}."""
    from hummingbird_spark.streaming.cdc import (
        apply_cdc_batch, decode_write_models, reduce_write_models,
    )

    o = load_table(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    k = (ok % 499).cast("string")
    v = ok.cast("string")
    ev = o.select(
        F.timestamp_seconds(ok).alias("ts"),
        ok.alias("seq"),
        F.lit("db.t").alias("ns"),
        F.when(ok % 7 == 3, F.lit("u"))
        .when(ok % 11 == 10, F.lit("d"))
        .otherwise(F.lit("i")).alias("op"),
        F.when(
            ok % 7 == 3,
            F.concat(F.lit('{"$set": {"v": '), v, F.lit("}}")),
        ).when(
            ok % 11 == 10,
            F.concat(F.lit('{"_id": '), k, F.lit("}")),
        ).otherwise(
            F.concat(F.lit('{"_id": '), k, F.lit(', "v": '), v,
                     F.lit("}")),
        ).alias("o"),
        F.when(
            ok % 7 == 3,
            F.concat(F.lit('{"_id": '), k, F.lit("}")),
        ).alias("o2"),
    )
    schema = T.StructType([
        T.StructField("_id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    tmp = tempfile.mkdtemp(prefix="hb_cdc_verify_")
    try:
        reduced = reduce_write_models(decode_write_models(ev))
        apply_cdc_batch(spark, reduced, f"{tmp}/t.parquet", "_id", schema)
        rows = (
            spark.read.parquet(f"{tmp}/t.parquet")
            .select("_id", "v").orderBy("_id")
            .collect()  # bounded: key space is 499
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


ORACLE_CDC_APPLY_VERIFY = """
WITH ev AS (
  SELECT o_orderkey AS ts,
         o_orderkey % 499 AS k,
         CASE WHEN o_orderkey % 7 = 3 THEN 'p'
              WHEN o_orderkey % 11 = 10 THEN 'd'
              ELSE 'i' END AS op,
         o_orderkey AS v
  FROM orders),
rd AS (
  SELECT k, op, v, ts,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC) AS rn
  FROM ev WHERE op IN ('i', 'd')),
last_rd AS (SELECT k, op, v, ts FROM rd WHERE rn = 1),
late_patch AS (
  SELECT e.k, e.v,
         ROW_NUMBER() OVER (PARTITION BY e.k ORDER BY e.ts DESC) AS rn
  FROM ev e JOIN last_rd l ON e.k = l.k AND e.ts > l.ts
  WHERE e.op = 'p' AND l.op = 'i')
SELECT CAST(l.k AS BIGINT) AS _id,
       CAST(COALESCE(p.v, l.v) AS BIGINT) AS v
FROM last_rd l
LEFT JOIN (SELECT k, v FROM late_patch WHERE rn = 1) p ON l.k = p.k
WHERE l.op = 'i'
ORDER BY _id
"""


R4_QUERIES["cdc_apply_verify"] = (
    q_cdc_apply_verify, ORACLE_CDC_APPLY_VERIFY,
    "CDC decode+fold+apply proven vs SQL replay of the event stream")


def q_rollup_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prove the continuous rollup's incremental maintenance exact:
    apply the events table as TWO micro-batches (split by event-id
    parity) through window_rollup_partials -> merge_rollup_batch into a
    temp rollup table, then return the final per-(hour, type) state.
    The oracle is the one-shot SQL aggregate over events — merge
    algebra (count/sum/min/max) is decomposable, so incremental ==
    direct, byte-for-byte. sum rides a 4dp round: the rollup
    accumulates doubles in batch order, the oracle in scan order
    (accumulated error ~1e-9 of the rounding step, documented safe)."""
    from hummingbird_spark.streaming.rollup import (
        merge_rollup_batch, window_rollup_partials,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value", "event_id")
    half1 = ev.filter(F.col("event_id") % 2 == 0).drop("event_id")
    half2 = ev.filter(F.col("event_id") % 2 == 1).drop("event_id")
    tmp = tempfile.mkdtemp(prefix="hb_rollup_verify_")
    try:
        path = f"{tmp}/rollup.parquet"
        merge_rollup_batch(spark, window_rollup_partials(half1), path,
                           batch_id=0)
        merge_rollup_batch(spark, window_rollup_partials(half2), path,
                           batch_id=1)
        final = (
            spark.read.parquet(path)
            .select(
                "window_start",
                F.col("key").alias("event_type"),
                "n_events",
                F.round("sum_value", 4).alias("sum_value"),
                "min_value", "max_value",
            )
            .orderBy("window_start", "event_type")
        )
        rows = final.collect()  # bounded: hours x event types
        schema = final.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


ORACLE_ROLLUP_VERIFY = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(CAST(value AS DOUBLE)), 4) AS sum_value,
       MIN(CAST(value AS DOUBLE)) AS min_value,
       MAX(CAST(value AS DOUBLE)) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


R4_QUERIES["rollup_verify"] = (
    q_rollup_verify, ORACLE_ROLLUP_VERIFY,
    "incremental 2-batch rollup state == one-shot SQL aggregate")


def q_zorder_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prove the z-order clustering rewrite content-preserving: cluster
    lineitem's (partkey, suppkey) projection along the z-curve, land it,
    and checksum the landed table (row count, md5 key checksum,
    decimal-exact quantity sum) against the same aggregates over the
    source — reordering must move every row, lose none, change none.
    The min/max-box tightness the rewrite exists for is plan/property
    tested in test_zorder.py; content preservation is the part an
    oracle can prove."""
    from hummingbird_spark.operators.zorder import cluster_by_zorder

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity",
    )
    tmp = tempfile.mkdtemp(prefix="hb_zorder_verify_")
    try:
        cluster_by_zorder(li, ["l_partkey", "l_suppkey"], num_files=16) \
            .write.mode("overwrite").parquet(f"{tmp}/z")
        z = spark.read.parquet(f"{tmp}/z")
        key_hash = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(
                        "|",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )), 1, 15),
                16, 10,
            ).cast("long") % _CKSUM_MOD
        )
        row = z.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(key_hash).alias("key_checksum"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("qty_sum"),
        ).collect()[0]  # bounded: exactly one row
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType([
        T.StructField("n_rows", T.LongType()),
        T.StructField("key_checksum", T.LongType()),
        T.StructField("qty_sum", T.DoubleType()),
    ])
    return spark.createDataFrame([row], schema)


ORACLE_ZORDER_VERIFY = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(('0x' || substr(md5(
                CAST(l_orderkey AS VARCHAR) || '|' ||
                CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
                % {_CKSUM_MOD}) AS BIGINT) AS key_checksum,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM lineitem
"""


R4_QUERIES["zorder_verify"] = (
    q_zorder_verify, ORACLE_ZORDER_VERIFY,
    "z-order clustering rewrite proven content-preserving")


def q_gopher_rule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021 A1) over the corpus,
    aggregated to per-source INTEGER rule-failure counts — the flags are
    pure Column expressions riding the scan (functions/text.py::
    gopher_quality_flags); the integer aggregate makes the oracle
    float-free."""
    from hummingbird_spark.functions.text import gopher_quality_flags
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    # the A1 rule expressions (regex + array lambdas) are the query's
    # CPU and ride the scan — spread the one-file bench scan first
    # (guide §2.5; no-op at real scale)
    d = ensure_kernel_parallelism(load_table(spark, sf_dir, "documents"))
    g = d.select("source", gopher_quality_flags(F.col("text")).alias("g"))

    def cnt(flag):
        return F.sum(F.col(f"g.{flag}").cast("long")).alias(f"n_{flag}")

    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("keep"),
            cnt("too_few_words"),
            cnt("bad_mean_word_len"),
            cnt("high_symbol_ratio"),
            cnt("bullet_heavy"),
            cnt("ellipsis_heavy"),
            cnt("low_alpha_words"),
            cnt("missing_stopwords"),
        )
        .orderBy("source")
    )


ORACLE_GOPHER_RULE_STATS = r"""
WITH t AS (
  SELECT source, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws,
         list_filter(string_split(text, chr(10)),
                     ln -> length(trim(ln)) > 0) AS lines
  FROM documents
), m AS (
  SELECT source,
    len(ws) AS n_words,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE CAST(COALESCE(list_sum(
                  list_transform(ws, w -> length(w))), 0) AS DOUBLE)
              / len(ws) END AS mwl,
    (length(text) - length(regexp_replace(text, '#', '', 'g')))
      AS n_hash_sym,
    len(regexp_extract_all(text, '\.{3}|…')) AS n_ell_sym,
    len(lines) AS n_lines,
    len(list_filter(lines,
        ln -> regexp_matches(trim(ln), '^[-*•]'))) AS n_bullet,
    len(list_filter(lines,
        ln -> regexp_matches(trim(ln), '(\.{3}|…)$'))) AS n_ell,
    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
    len(list_filter(['the','be','to','of','and','that','have','with'],
        s -> list_contains(list_transform(ws, w -> lower(w)), s)))
      AS n_stop
  FROM t
), f AS (
  SELECT source,
    (n_words < 50) AS too_few_words,
    (n_words > 100000) AS too_many_words,
    (mwl < 3.0 OR mwl > 10.0) AS bad_mean_word_len,
    -- Gopher applies 0.1 to EACH symbol class separately
    (CASE WHEN n_words = 0 THEN 0.0
          ELSE CAST(n_hash_sym AS DOUBLE) / n_words END > 0.1
     OR CASE WHEN n_words = 0 THEN 0.0
          ELSE CAST(n_ell_sym AS DOUBLE) / n_words END > 0.1)
      AS high_symbol_ratio,
    (CASE WHEN n_lines = 0 THEN 0.0
          ELSE CAST(n_bullet AS DOUBLE) / n_lines END > 0.9)
      AS bullet_heavy,
    (CASE WHEN n_lines = 0 THEN 0.0
          ELSE CAST(n_ell AS DOUBLE) / n_lines END > 0.3)
      AS ellipsis_heavy,
    (CASE WHEN n_words = 0 THEN 0.0
          ELSE CAST(n_alpha AS DOUBLE) / n_words END < 0.8)
      AS low_alpha_words,
    (n_stop < 2) AS missing_stopwords
  FROM m
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN NOT (too_few_words OR too_many_words
       OR bad_mean_word_len OR high_symbol_ratio OR bullet_heavy
       OR ellipsis_heavy OR low_alpha_words OR missing_stopwords)
       THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  CAST(SUM(CASE WHEN too_few_words THEN 1 ELSE 0 END) AS BIGINT)
    AS n_too_few_words,
  CAST(SUM(CASE WHEN bad_mean_word_len THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bad_mean_word_len,
  CAST(SUM(CASE WHEN high_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT)
    AS n_high_symbol_ratio,
  CAST(SUM(CASE WHEN bullet_heavy THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bullet_heavy,
  CAST(SUM(CASE WHEN ellipsis_heavy THEN 1 ELSE 0 END) AS BIGINT)
    AS n_ellipsis_heavy,
  CAST(SUM(CASE WHEN low_alpha_words THEN 1 ELSE 0 END) AS BIGINT)
    AS n_low_alpha_words,
  CAST(SUM(CASE WHEN missing_stopwords THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missing_stopwords
FROM f
GROUP BY source
ORDER BY source
"""


R4_QUERIES["gopher_rule_stats"] = (
    q_gopher_rule_stats, ORACLE_GOPHER_RULE_STATS,
    "Gopher A1 quality rules: per-source integer failure counts")


def _all_grams(ws, n: int):
    """Non-deduplicated word n-grams from a MATERIALIZED token array
    (counts matter here, unlike the shingle pipelines' distinct sets;
    same bound-column performance contract as ngrams_from_tokens)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int"))
                   for j in range(n)]),
    )
    return F.when(F.size(ws) < n, F.array().cast("array<string>")) \
        .otherwise(grams)


def q_ngram_repetition_stats(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The rest of Gopher's A1.1 repetition family (repetition_stats
    covers the top-WORD fraction): per-doc top-2-GRAM fraction plus the
    duplicate-5-gram fraction in BOTH weightings — occurrence fraction
    and Gopher's character weighting (fraction of gram-characters that
    sit inside duplicated 5-grams; denominator is total gram-chars,
    the overlap-tolerant published variant).

    Scale shape: both metrics shuffle (doc, md5(gram), len) count
    tuples — the gram itself never shuffles (16-hex key + one int vs
    ~40-byte text), and the per-doc rollup is the same two-level
    aggregation as repetition_stats."""
    from hummingbird_spark.functions.text import tokens
    from hummingbird_spark.operators.dedup import (
        ensure_kernel_parallelism,
    )

    # tokenize + both gram explodes + per-gram md5 ride the scan
    # stage — spread the one-file bench scan first (guide §2.5);
    # no-op at real scale
    d = ensure_kernel_parallelism(
        load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", tokens(F.lower(F.col("text"))).alias("ws"))

    def metric(n: int, *agg_fns):
        g = d.select(
            "doc_id", "lang",
            F.explode(_all_grams(F.col("ws"), n)).alias("__g"),
        ).select(
            "doc_id", "lang",
            F.substring(F.md5("__g"), 1, 16).alias("g"),
            F.length("__g").alias("gl"),
        )
        # gl is functionally dependent on g; grouping by both is free
        per_gram = g.groupBy("doc_id", "lang", "g", "gl").agg(
            F.count(F.lit(1)).alias("c"))
        return per_gram.groupBy("doc_id", "lang").agg(*agg_fns)

    d2 = metric(2, (F.max("c").cast("double") / F.sum("c"))
                .alias("top2"))
    d5 = metric(
        5,
        (F.sum(F.when(F.col("c") > 1, F.col("c"))
               .otherwise(F.lit(0))).cast("double")
         / F.sum("c")).alias("dup5"),
        (F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("gl"))
               .otherwise(F.lit(0))).cast("double")
         / F.sum(F.col("c") * F.col("gl"))).alias("dup5c"),
    )
    a2 = d2.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n2_docs"),
        F.round(F.avg("top2"), 6).alias("avg_top2_frac"),
        F.sum((F.col("top2") > 0.2).cast("long")).alias("n_top2_heavy"),
    )
    a5 = d5.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n5_docs"),
        F.round(F.avg("dup5"), 6).alias("avg_dup5_frac"),
        F.sum((F.col("dup5") > 0.3).cast("long")).alias("n_dup5_heavy"),
        F.round(F.avg("dup5c"), 6).alias("avg_dup5_char_frac"),
        F.sum((F.col("dup5c") > 0.3).cast("long"))
        .alias("n_dup5_char_heavy"),
    )
    return a2.join(a5, "lang", "full").orderBy("lang")


ORACLE_NGRAM_REPETITION = r"""
WITH words AS (
  SELECT doc_id, lang,
         string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE length(trim(text)) > 0
), g2 AS (
  SELECT doc_id, lang,
         substr(md5(unnest(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1]))), 1, 16) AS g
  FROM words WHERE len(ws) >= 2
), c2 AS (
  SELECT doc_id, lang, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2, 3
), d2 AS (
  SELECT doc_id, lang, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top2
  FROM c2 GROUP BY 1, 2
), a2 AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n2_docs,
         round(AVG(top2), 6) AS avg_top2_frac,
         CAST(SUM(CASE WHEN top2 > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_top2_heavy
  FROM d2 GROUP BY lang
), g5 AS (
  SELECT doc_id, lang,
         substr(md5(gram), 1, 16) AS g, length(gram) AS gl
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                    || ws[i+3] || ' ' || ws[i+4])) AS gram
    FROM words WHERE len(ws) >= 5)
), c5 AS (
  SELECT doc_id, lang, g, gl, COUNT(*) AS c FROM g5 GROUP BY 1, 2, 3, 4
), d5 AS (
  SELECT doc_id, lang,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
           / SUM(c) AS dup5,
         CAST(SUM(CASE WHEN c > 1 THEN c * gl ELSE 0 END) AS DOUBLE)
           / SUM(c * gl) AS dup5c
  FROM c5 GROUP BY 1, 2
), a5 AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n5_docs,
         round(AVG(dup5), 6) AS avg_dup5_frac,
         CAST(SUM(CASE WHEN dup5 > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup5_heavy,
         round(AVG(dup5c), 6) AS avg_dup5_char_frac,
         CAST(SUM(CASE WHEN dup5c > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup5_char_heavy
  FROM d5 GROUP BY lang
)
SELECT COALESCE(a2.lang, a5.lang) AS lang,
       n2_docs, avg_top2_frac, n_top2_heavy,
       n5_docs, avg_dup5_frac, n_dup5_heavy,
       avg_dup5_char_frac, n_dup5_char_heavy
FROM a2 FULL JOIN a5 ON a2.lang = a5.lang
ORDER BY lang
"""


R4_QUERIES["ngram_repetition_stats"] = (
    q_ngram_repetition_stats, ORACLE_NGRAM_REPETITION,
    "Gopher n-gram repetition: top-2-gram + dup-5-gram per lang")


def q_boilerplate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line profile per source
    (operators/dedup.py::boilerplate_line_stats — the RefinedWeb/CCNet
    line-dedup signal): lines whose trimmed text occurs in >= min_docs
    distinct documents, rolled up per source as pure integers."""
    from hummingbird_spark.operators.dedup import boilerplate_line_stats

    d = load_table(spark, sf_dir, "documents")
    stats = boilerplate_line_stats(d, min_docs=3)
    return (
        stats.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines").alias("n_lines"),
            F.sum("n_boilerplate_lines").alias("n_boilerplate_lines"),
            F.sum((F.col("n_boilerplate_lines") > 0).cast("long"))
            .alias("n_docs_affected"),
        )
        .orderBy("source")
    )


ORACLE_BOILERPLATE_STATS = r"""
WITH lines AS (
  SELECT doc_id, source,
         substr(md5(trim(l)), 1, 16) AS lh
  FROM (SELECT doc_id, source,
               unnest(string_split(text, chr(10))) AS l
        FROM documents)
  WHERE length(trim(l)) > 0
), freq AS (
  SELECT lh, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY lh
), per_doc AS (
  SELECT l.doc_id, l.source,
         COUNT(*) AS n_lines,
         SUM(CASE WHEN f.nd >= 3 THEN 1 ELSE 0 END) AS n_bp
  FROM lines l JOIN freq f ON l.lh = f.lh
  GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(n_bp) AS BIGINT) AS n_boilerplate_lines,
       CAST(SUM(CASE WHEN n_bp > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_affected
FROM per_doc GROUP BY source ORDER BY source
"""


R4_QUERIES["boilerplate_stats"] = (
    q_boilerplate_stats, ORACLE_BOILERPLATE_STATS,
    "cross-doc boilerplate line profile per source (line dedup)")


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style curation funnel as ONE query: Gopher A1 rules ->
    C4 rules -> exact dedup (corpus-global first-keeper per
    fingerprint), reported as per-source survivor counts at each stage.
    Both rule families are pure Column expressions riding a single
    scan; the only shuffles are the dedup fingerprint groupBy and the
    rollup — the plan a 100 TB curation sweep wants. The keeper is
    min(struct) per fingerprint, not a row_number window: partial
    aggregation absorbs a 100k-copy boilerplate fingerprint map-side
    where a window would sort it in one task."""
    from hummingbird_spark.functions.text import (
        c4_quality_flags,
        fingerprint,
        gopher_quality_flags,
    )

    d = load_table(spark, sf_dir, "documents")
    flags = d.select(
        "doc_id", "source",
        gopher_quality_flags(F.col("text"))["keep"].alias("gk"),
        c4_quality_flags(F.col("text"))["keep"].alias("ck"),
        fingerprint(F.col("text")).alias("fp"),
    )
    survivors = flags.filter(F.col("gk") & F.col("ck"))
    keepers = survivors.groupBy("fp").agg(
        F.min(F.struct("doc_id", "source")).alias("k"))
    base = flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("gk").cast("long")).alias("n_pass_gopher"),
        F.sum((F.col("gk") & F.col("ck")).cast("long"))
        .alias("n_pass_both"),
    )
    kept = keepers.groupBy(F.col("k.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_kept"))
    return (
        base.join(kept, "source", "left")
        .select(
            "source", "n_docs", "n_pass_gopher", "n_pass_both",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


ORACLE_QUALITY_FUNNEL = r"""
WITH t AS (
  SELECT doc_id, source, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws,
         list_filter(string_split(text, chr(10)),
                     ln -> length(trim(ln)) > 0) AS lines
  FROM documents
), g AS (
  SELECT doc_id, source, text, lines,
    (len(ws) >= 50 AND len(ws) <= 100000
     AND (CASE WHEN len(ws) = 0 THEN 0.0
          ELSE CAST(COALESCE(list_sum(list_transform(ws,
               w -> length(w))), 0) AS DOUBLE) / len(ws) END)
         BETWEEN 3.0 AND 10.0
     AND (CASE WHEN len(ws) = 0 THEN 0.0
          ELSE CAST(length(text)
               - length(regexp_replace(text, '#', '', 'g')) AS DOUBLE)
               / len(ws) END) <= 0.1
     AND (CASE WHEN len(ws) = 0 THEN 0.0
          ELSE CAST(len(regexp_extract_all(text, '\.{3}|…')) AS DOUBLE)
               / len(ws) END) <= 0.1
     AND (CASE WHEN len(lines) = 0 THEN 0.0
          ELSE CAST(len(list_filter(lines,
               ln -> regexp_matches(trim(ln), '^[-*•]'))) AS DOUBLE)
               / len(lines) END) <= 0.9
     AND (CASE WHEN len(lines) = 0 THEN 0.0
          ELSE CAST(len(list_filter(lines,
               ln -> regexp_matches(trim(ln), '(\.{3}|…)$')))
               AS DOUBLE) / len(lines) END) <= 0.3
     AND (CASE WHEN len(ws) = 0 THEN 0.0
          ELSE CAST(len(list_filter(ws,
               w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               / len(ws) END) >= 0.8
     AND len(list_filter(
            ['the','be','to','of','and','that','have','with'],
            s -> list_contains(list_transform(ws, w -> lower(w)), s)))
         >= 2) AS gk,
    (len(lines) >= 3
     AND (CASE WHEN len(lines) = 0 THEN 0.0
          ELSE CAST(list_sum(list_transform(lines,
               l -> length(l))) AS DOUBLE) / len(lines) END) >= 20.0
     AND (CASE WHEN len(lines) = 0 THEN 0.0
          ELSE CAST(len(list_filter(lines,
               l -> regexp_matches(trim(l), '[.!?"]$'))) AS DOUBLE)
               / len(lines) END) >= 0.5
     AND NOT contains(lower(text), 'lorem ipsum')
     AND NOT contains(text, '{')) AS ck
  FROM t
), p AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM g WHERE gk AND ck
), k AS (
  SELECT source FROM (
    SELECT source,
           ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM p) WHERE rn = 1
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN gk THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_gopher,
         CAST(SUM(CASE WHEN gk AND ck THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_both
  FROM g GROUP BY source
), kc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept FROM k
  GROUP BY source
)
SELECT agg.source, n_docs, n_pass_gopher, n_pass_both,
       COALESCE(n_kept, 0) AS n_kept
FROM agg LEFT JOIN kc ON agg.source = kc.source
ORDER BY agg.source
"""


R4_QUERIES["quality_funnel"] = (
    q_quality_funnel, ORACLE_QUALITY_FUNNEL,
    "FineWeb-style funnel: gopher -> c4 -> exact dedup per source")


def q_exact_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup profile (Lee et al. 2021) per source:
    duplicated 20-token windows keep their globally-first occurrence,
    every later occurrence is a removal span, spans merge per doc
    (operators/dedup.py::duplicate_substring_spans). min_len=20 suits
    the fixture's 10-99-token docs; production default is 50.

    One windows shuffle (id, start, 32-hex md5) + two window functions +
    the per-source rollup — the plan shape is inverted-index-sized at
    any corpus scale."""
    from hummingbird_spark.functions.text import tokens
    from hummingbird_spark.operators.dedup import duplicate_substring_spans

    d = load_table(spark, sf_dir, "documents")
    spans = duplicate_substring_spans(d, min_len=20)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum(F.col("end") - F.col("start") + 1).alias("rem"))
    base = d.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("nt"))
    return (
        base.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum((F.col("ns") > 0).cast("long")), F.lit(0))
            .alias("n_docs_trimmed"),
            F.sum("nt").cast("long").alias("tokens_total"),
            F.coalesce(F.sum("rem"), F.lit(0)).alias("tokens_removed"),
            F.coalesce(F.sum("ns"), F.lit(0)).alias("n_spans"),
        )
        .orderBy("source")
    )


ORACLE_EXACT_SUBSTRING = r"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
), w AS (
  SELECT doc_id, (u).s AS s, (u).h AS h FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 18),
        s -> struct_pack(s := s,
             h := md5(array_to_string(ws[s:s+19], ' '))))) AS u
    FROM t WHERE len(ws) >= 20)
), r AS (
  SELECT doc_id, s AS start_, s + 19 AS end_ FROM (
    SELECT doc_id, s,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
    FROM w)
  WHERE rn > 1
), m AS (
  SELECT doc_id, isl, MIN(start_) AS start_, MAX(end_) AS end_ FROM (
    SELECT doc_id, start_, end_,
           SUM(CASE WHEN pe IS NULL OR start_ > pe + 1
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start_
                   ROWS UNBOUNDED PRECEDING) AS isl
    FROM (SELECT doc_id, start_, end_,
                 MAX(end_) OVER (PARTITION BY doc_id ORDER BY start_
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS pe
          FROM r))
  GROUP BY doc_id, isl
), pd AS (
  SELECT doc_id, COUNT(*) AS ns, SUM(end_ - start_ + 1) AS rem
  FROM m GROUP BY doc_id
)
SELECT t.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COALESCE(SUM(CASE WHEN pd.ns > 0 THEN 1 ELSE 0 END), 0)
       AS BIGINT) AS n_docs_trimmed,
  CAST(SUM(len(ws)) AS BIGINT) AS tokens_total,
  CAST(COALESCE(SUM(rem), 0) AS BIGINT) AS tokens_removed,
  CAST(COALESCE(SUM(pd.ns), 0) AS BIGINT) AS n_spans
FROM t LEFT JOIN pd USING (doc_id)
GROUP BY t.source ORDER BY t.source
"""


R4_QUERIES["exact_substring_stats"] = (
    q_exact_substring_stats, ORACLE_EXACT_SUBSTRING,
    "Lee-et-al exact-substring dedup spans per source (20-token)")


def q_exact_substring_rebuild_verify(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Oracle-grade proof of the exact-substring REBUILD itself (the
    stats query proves the spans): run remove_duplicate_substrings
    over documents and checksum the resulting text per source — md5 of
    every rebuilt doc summed mod a prime, plus the post-cut token
    count. The oracle replays span detection, island merge, AND the
    positional rebuild in SQL (untouched docs byte-identical, trimmed
    docs single-space re-joined), so any deviation in cut placement or
    whitespace handling hash-mismatches."""
    from hummingbird_spark.functions.text import tokens
    from hummingbird_spark.operators.dedup import (
        remove_duplicate_substrings,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    out = remove_duplicate_substrings(d, min_len=20)
    cks = (
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long") % _CKSUM_MOD
    )
    return (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(cks).alias("text_checksum"),
            F.sum(F.size(tokens(F.col("text")))).cast("long")
            .alias("tokens_after"),
        )
        .orderBy("source")
    )


ORACLE_EXACT_SUBSTRING_REBUILD = rf"""
WITH t AS (
  SELECT doc_id, source, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
), w AS (
  SELECT doc_id, (u).s AS s, (u).h AS h FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 18),
        s -> struct_pack(s := s,
             h := md5(array_to_string(ws[s:s+19], ' '))))) AS u
    FROM t WHERE len(ws) >= 20)
), r AS (
  SELECT doc_id, s AS start_, s + 19 AS end_ FROM (
    SELECT doc_id, s,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
    FROM w)
  WHERE rn > 1
), m AS (
  SELECT doc_id, isl, MIN(start_) AS start_, MAX(end_) AS end_ FROM (
    SELECT doc_id, start_, end_,
           SUM(CASE WHEN pe IS NULL OR start_ > pe + 1
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start_
                   ROWS UNBOUNDED PRECEDING) AS isl
    FROM (SELECT doc_id, start_, end_,
                 MAX(end_) OVER (PARTITION BY doc_id ORDER BY start_
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS pe
          FROM r))
  GROUP BY doc_id, isl
), sp AS (
  SELECT doc_id, list(struct_pack(s := start_, e := end_)) AS spans
  FROM m GROUP BY doc_id
), rb AS (
  SELECT t.doc_id, t.source,
    CASE WHEN sp.spans IS NULL THEN t.text
         -- array_to_string of an EMPTY list is NULL in DuckDB;
         -- Spark's concat_ws gives '' (fully-cut doc)
         ELSE COALESCE(array_to_string(
            list_transform(
              list_filter(range(1, len(ws) + 1),
                i -> len(list_filter(sp.spans,
                     p -> i >= p.s AND i <= p.e)) = 0),
              i -> ws[i]), ' '), '')
    END AS text
  FROM t LEFT JOIN sp USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT
           % {_CKSUM_MOD}) AS BIGINT) AS text_checksum,
  CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END)
       AS BIGINT) AS tokens_after
FROM rb GROUP BY source ORDER BY source
"""


R4_QUERIES["exact_substring_rebuild_verify"] = (
    q_exact_substring_rebuild_verify, ORACLE_EXACT_SUBSTRING_REBUILD,
    "substring-dedup rebuild proven content-exact vs SQL replay")


def q_boilerplate_strip_verify(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Oracle-grade proof of the boilerplate line-strip REBUILD
    (boilerplate_stats proves the profile): run strip_boilerplate_lines
    over documents and checksum every output doc per source. The
    operator guarantees docs WITHOUT boilerplate lines pass through
    byte-identical and affected docs are rebuilt with only the
    boilerplate lines removed (blank lines preserved); the oracle
    replays both branches in SQL. The fixture corpus has few cross-doc
    repeated lines at sf0.01 — the strip branch is additionally
    exercised by the crafted-docs pytest — so what this query mainly
    pins is the byte-identity of the untouched path, which is where a
    silent rebuild bug would corrupt the corpus at scale."""
    from hummingbird_spark.operators.dedup import strip_boilerplate_lines

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    out = strip_boilerplate_lines(d, min_docs=3)
    cks = (
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long") % _CKSUM_MOD
    )
    lines_after = F.size(F.filter(
        F.split(F.col("text"), r"\n"),
        lambda ln: F.length(F.trim(ln)) > 0))
    return (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(cks).alias("text_checksum"),
            F.sum(lines_after).cast("long").alias("lines_after"),
        )
        .orderBy("source")
    )


ORACLE_BOILERPLATE_STRIP = f"""
WITH t AS (
  SELECT doc_id, source, text, string_split(text, chr(10)) AS ls
  FROM documents
), freq AS (
  SELECT trim(ln) AS ln, COUNT(DISTINCT doc_id) AS nd FROM (
    SELECT doc_id, unnest(ls) AS ln FROM t)
  WHERE length(trim(ln)) > 0
  GROUP BY trim(ln)
), common AS (
  SELECT COALESCE(list(ln), []) AS cl FROM freq WHERE nd >= 3
), rb AS (
  -- untouched docs (no boilerplate line) pass through byte-identical;
  -- affected docs keep every non-boilerplate line (blanks included)
  SELECT doc_id, source,
         CASE WHEN text IS NULL THEN NULL
              WHEN len(list_filter(ls, x -> list_contains(cl, trim(x))))
                   = 0 THEN text
              ELSE COALESCE(array_to_string(
                 list_filter(ls, x -> NOT list_contains(cl, trim(x))),
                 chr(10)), '')
         END AS text
  FROM t, common
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT
           % {_CKSUM_MOD}) AS BIGINT) AS text_checksum,
  CAST(SUM(len(list_filter(string_split(text, chr(10)),
            x -> length(trim(x)) > 0))) AS BIGINT) AS lines_after
FROM rb GROUP BY source ORDER BY source
"""


R4_QUERIES["boilerplate_strip_verify"] = (
    q_boilerplate_strip_verify, ORACLE_BOILERPLATE_STRIP,
    "line-strip rebuild proven content-exact vs SQL replay")
