"""Training-data pipeline queries: text analysis, dedup, similarity
search over the documents/embeddings fixtures — each with a DuckDB
oracle where the computation is SQL-expressible (hash functions are md5,
chosen for engine portability). LSH-approximate variants whose candidate
pruning is probabilistic get rows-only checks; their exact counterparts
carry the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbird_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from hummingbird_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from hummingbird_spark.operators.similarity import (
    cosine_topk,
    exact_near_duplicate_pairs,
    lsh_topk,
    near_duplicate_pairs,
)
from hummingbird_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        fingerprint(F.col("text")).alias("fingerprint"),
    )


ORACLE_DOC_STATS = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
       length(text) AS n_chars_actual,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.functions.text import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        token_count(F.col("text")).alias("n_ws_tokens"),
    )


ORACLE_DOC_BPE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))
         AS n_bpe_tokens,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END
         AS n_ws_tokens
FROM documents
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the approx variant is
    percentile_approx — rows-only by nature; this exact one has an
    oracle: both engines use linear interpolation on sorted values)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


ORACLE_DOC_QUALITY = r"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
), c AS (
  SELECT doc_id, text, ws,
         CAST(len(ws) AS DOUBLE) AS n_tok,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
         CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(len(list_filter(ws, w -> lower(w) IN
                   ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE)
                   / CAST(len(ws) AS DOUBLE) END AS stop_ratio,
         CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                   / CAST(len(ws) AS DOUBLE) END AS wl
  FROM t
)
SELECT doc_id,
       round(0.4 * alpha_ratio
             + 0.2 * least(stop_ratio * 5.0, 1.0)
             + 0.2 * (CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.0 END)
             + 0.2 * least(n_tok / 50.0, 1.0), 6) AS quality
FROM c
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id(F.col("text")).alias("pred_lang"))


# tie-break = lexicographically largest language (Spark array_max on
# (score, lang) structs), hence the descending-lex CASE chain.
ORACLE_DOC_LANG = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE list_transform(string_split_regex(trim(text), '\s+'),
                                  w -> lower(w)) END AS ws
  FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(ws, w -> w IN ('the','a','of','and','to')))    AS s_en,
    len(list_filter(ws, w -> w IN ('el','la','de','que','y')))     AS s_es,
    len(list_filter(ws, w -> w IN ('der','die','das','und','ist'))) AS s_de,
    len(list_filter(ws, w -> w IN ('le','la','les','et','est')))   AS s_fr,
    len(list_filter(ws, w -> w IN ('的','是','了','在','我')))        AS s_zh
  FROM t
)
SELECT doc_id,
  CASE
    WHEN s_zh > 0 AND s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
    WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
    WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
    WHEN s_en > 0 AND s_en >= s_de THEN 'en'
    WHEN s_de > 0 THEN 'de'
    ELSE 'und'
  END AS pred_lang
FROM s
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup_exact(d).select("doc_id", "lang", "source")


ORACLE_DEDUP_EXACT = r"""
WITH fp AS (
  SELECT doc_id, lang, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
  FROM documents
), keep AS (
  SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f
)
SELECT fp.doc_id, fp.lang, fp.source
FROM fp JOIN keep ON fp.doc_id = keep.doc_id AND fp.f = keep.f
"""


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_duplicate_groups(d)


ORACLE_DUP_GROUPS = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents
GROUP BY fingerprint HAVING COUNT(*) > 1
"""


def q_dup_group_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-group size histogram: how many exact-duplicate groups
    of each size exist. Non-vacuous at every SF (the size-1 bucket is
    the unique docs), where exact_dup_groups (HAVING > 1) is legitimately
    empty below sf0.1 — this keeps the fingerprint/grouping machinery
    under a non-trivial oracle at the sf0.01 driver gate."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(fingerprint(F.col("text")).alias("f"))
        .groupBy("f").agg(F.count(F.lit(1)).alias("n_docs"))
        .groupBy("n_docs").agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy("n_docs")
    )


ORACLE_DUP_HISTOGRAM = r"""
SELECT n_docs, COUNT(*) AS n_groups
FROM (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
             COUNT(*) AS n_docs
      FROM documents GROUP BY f) g
GROUP BY n_docs ORDER BY n_docs
"""


def q_minhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, threshold=0.7, num_hashes=16, bands=4, ngram=3
    )


# replicates the Spark plan exactly: 3-gram shingles, one 60-bit md5
# prefix per shingle, 16 seeded linear-transform minima (same constants
# as operators.dedup.minhash_coefficients), 4 bands x 4 rows,
# band-collision candidates, exact-jaccard verify.
from hummingbird_spark.operators.dedup import (  # noqa: E402
    MINHASH_P,
    minhash_coefficients,
)

_COEFFS = minhash_coefficients(16)
_HASH_MINS = ",\n         ".join(
    f"min((({a} * v) + {b}) % {MINHASH_P}) AS m{i}"
    for i, (a, b) in enumerate(_COEFFS)
)
_SIG_LIST = ", ".join(f"m{i}" for i in range(16))

ORACLE_MINHASH = rf"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents WHERE length(trim(text)) > 0
), shingles AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM words WHERE len(ws) >= 3
), ex AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT % {MINHASH_P} AS v
  FROM shingles
), sigv AS (
  SELECT doc_id,
         {_HASH_MINS}
  FROM ex GROUP BY doc_id
), sigl AS (
  SELECT doc_id, [{_SIG_LIST}] AS sig FROM sigv
), banded AS (
  SELECT doc_id, bands.band,
         CAST(sig[bands.band*4+1] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+2] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+3] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+4] AS VARCHAR) AS bkey
  FROM sigl CROSS JOIN (SELECT unnest(range(4)) AS band) bands
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
)
SELECT a, b,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
             CAST(len(sa.sh) + len(sb.sh)
                  - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) AS jaccard
FROM cand
JOIN shingles sa ON sa.doc_id = cand.a
JOIN shingles sb ON sb.doc_id = cand.b
WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            CAST(len(sa.sh) + len(sb.sh)
                 - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.7
ORDER BY a, b
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from MinHash pairs: the last step of a real
    dedup pipeline (pairs alone don't dedup — transitive groups do).
    Connected components by min-label propagation; one row per cluster
    with its canonical doc (min id) and size."""
    from hummingbird_spark.operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        d, threshold=0.7, num_hashes=16, bands=4, ngram=3
    )
    labels = connected_components(pairs, "a", "b")
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .orderBy(F.desc("cluster_size"), "cluster_id")
    )


# Same pair SQL as ORACLE_MINHASH, then components via a recursive
# reachability CTE: min reachable id == Spark's converged min label.
ORACLE_DUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({ORACLE_MINHASH}),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, root) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, COUNT(*) AS cluster_size
FROM comp GROUP BY cluster_id
ORDER BY cluster_size DESC, cluster_id
"""


def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (Gopher-style): distinct/total token
    ratio per doc. Pure projection — rides the scan, zero shuffle."""
    from hummingbird_spark.functions.text import token_diversity

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(token_diversity(F.col("text")), 6).alias("diversity"),
    )


ORACLE_TOKEN_DIVERSITY = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
)
SELECT doc_id, len(ws) AS n_tokens,
       CASE WHEN len(ws) = 0 THEN 0.0
            ELSE round(CAST(len(list_distinct(ws)) AS DOUBLE)
                       / CAST(len(ws) AS DOUBLE), 6) END AS diversity
FROM t
"""


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, Appendix A1.2 —
    the published 'repetitious text' table) over the documents table;
    the semantics live in
    operators/quality_repetition.py::gopher_repetition_stats."""
    from hummingbird_spark.operators.quality_repetition import (
        gopher_repetition_stats,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_repetition_stats(d).orderBy("doc_id")


def _grams_sql(n: int) -> str:
    # len - n + 1 grams: i in [1, len - n + 1], range() excludes its
    # upper bound so it is len + 2 - n
    parts = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    return (f"SELECT doc_id, unnest(list_transform("
            f"range(1, len(ws) + 2 - {n}), i -> {parts})) AS g "
            f"FROM t WHERE len(ws) >= {n}")


ORACLE_GOPHER_REPETITION = r"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws,
         list_filter(list_transform(string_split(text, chr(10)),
             x -> trim(x)), x -> length(x) > 0) AS ln,
         list_filter(list_transform(
             string_split_regex(text, '\n{2,}'),
             x -> trim(x)), x -> length(x) > 0) AS pg
  FROM documents
),
""" + f"""
g2 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_grams_sql(2)})
       GROUP BY doc_id, g),
g3 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_grams_sql(3)})
       GROUP BY doc_id, g),
g5 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_grams_sql(5)})
       GROUP BY doc_id, g),
""" + """
t2 AS (SELECT doc_id, CASE WHEN c >= 2 THEN c * length(g)
                           ELSE 0 END AS top2 FROM g2
       QUALIFY row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g DESC) = 1),
t3 AS (SELECT doc_id, CASE WHEN c >= 2 THEN c * length(g)
                           ELSE 0 END AS top3 FROM g3
       QUALIFY row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g DESC) = 1),
d5 AS (SELECT doc_id, SUM(c * length(g)) AS dup5 FROM g5
       WHERE c > 1 GROUP BY doc_id),
m AS (
  SELECT t.doc_id,
    len(ln) AS n_ln, len(list_distinct(ln)) AS n_dln,
    coalesce(list_sum(list_transform(ln, x -> length(x))), 0) AS lc,
    coalesce(list_sum(list_transform(list_distinct(ln),
        x -> length(x))), 0) AS dlc,
    len(pg) AS n_pg, len(list_distinct(pg)) AS n_dpg,
    coalesce(list_sum(list_transform(pg, x -> length(x))), 0) AS pc,
    coalesce(list_sum(list_transform(list_distinct(pg),
        x -> length(x))), 0) AS dpc,
    length(text) AS nchars,
    coalesce(t2.top2, 0) AS top2, coalesce(t3.top3, 0) AS top3,
    coalesce(d5.dup5, 0) AS dup5
  FROM t LEFT JOIN t2 ON t.doc_id = t2.doc_id
         LEFT JOIN t3 ON t.doc_id = t3.doc_id
         LEFT JOIN d5 ON t.doc_id = d5.doc_id
),
f AS (
  SELECT doc_id,
    CASE WHEN n_ln = 0 THEN 0.0 ELSE round(
      CAST(n_ln - n_dln AS DOUBLE) / n_ln, 6) END AS dup_line_frac,
    CASE WHEN lc = 0 THEN 0.0 ELSE round(
      CAST(lc - dlc AS DOUBLE) / lc, 6) END AS dup_line_char_frac,
    CASE WHEN n_pg = 0 THEN 0.0 ELSE round(
      CAST(n_pg - n_dpg AS DOUBLE) / n_pg, 6) END AS dup_para_frac,
    CASE WHEN pc = 0 THEN 0.0 ELSE round(
      CAST(pc - dpc AS DOUBLE) / pc, 6) END AS dup_para_char_frac,
    CASE WHEN nchars = 0 THEN 0.0 ELSE round(
      CAST(top2 AS DOUBLE) / nchars, 6) END AS top2_char_frac,
    CASE WHEN nchars = 0 THEN 0.0 ELSE round(
      CAST(top3 AS DOUBLE) / nchars, 6) END AS top3_char_frac,
    CASE WHEN nchars = 0 THEN 0.0 ELSE round(
      CAST(dup5 AS DOUBLE) / nchars, 6) END AS dup5_char_frac
  FROM m
)
SELECT *,
  CAST(dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
       AND dup_para_frac <= 0.30 AND dup_para_char_frac <= 0.20
       AND top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
       AND dup5_char_frac <= 0.15 AS INT) AS keep
FROM f
ORDER BY doc_id
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample: keep docs whose md5(doc_id) lands in
    the first 10 of 100 hash slots, then per-lang stats. THE reproducible
    sampling shape for training pipelines — unlike rand()-based
    sample(), re-runs/backfills/engines agree on membership, and the
    filter rides the scan (no shuffle before the rollup)."""
    d = load_table(spark, sf_dir, "documents")
    slot = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long") % 100
    )
    return (
        d.filter(slot < 10)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.col("n_chars")).alias("sum_chars"))
        .orderBy("lang")
    )


ORACLE_HASH_SAMPLE = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
GROUP BY lang ORDER BY lang
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone n-gram Jaccard scores (no threshold) for LSH band
    candidates — the raw similarity surface the near-dup cut applies to."""
    from hummingbird_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signature_df,
    )

    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signature_df(d, num_hashes=16, ngram=3)
    cands = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    return jaccard_pairs(d, cands, ngram=3).orderBy("a", "b")


ORACLE_NGRAM_JACCARD = rf"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents WHERE length(trim(text)) > 0
), shingles AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM words WHERE len(ws) >= 3
), ex AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT % {MINHASH_P} AS v
  FROM shingles
), sigv AS (
  SELECT doc_id,
         {_HASH_MINS}
  FROM ex GROUP BY doc_id
), sigl AS (
  SELECT doc_id, [{_SIG_LIST}] AS sig FROM sigv
), banded AS (
  SELECT doc_id, bands.band,
         CAST(sig[bands.band*4+1] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+2] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+3] AS VARCHAR) || '|' ||
         CAST(sig[bands.band*4+4] AS VARCHAR) AS bkey
  FROM sigl CROSS JOIN (SELECT unnest(range(4)) AS band) bands
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
)
SELECT a, b,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
             CAST(len(sa.sh) + len(sb.sh)
                  - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) AS jaccard
FROM cand
JOIN shingles sa ON sa.doc_id = cand.a
JOIN shingles sb ON sb.doc_id = cand.b
ORDER BY a, b
"""

def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline a training-data run actually
    executes: quality cut -> language cut -> exact dedup (keep min
    doc_id per fingerprint) -> per-source survivor stats. The scored
    frame (all projections, no shuffle) is staged once — it feeds both
    the dedup agg and the survivor probe, and re-scanning 100 TB of
    text to recompute quality scores is the classic accidental 2x.
    Then: dedup agg shuffle, broadcast the tiny keep set back, rollup
    shuffle — 2 shuffles total regardless of corpus size."""
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    d = ensure_kernel_parallelism(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "source",
        token_count(F.col("text")).alias("n_tokens"),
        fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("pred_lang"),
    ).filter(
        (F.col("quality") >= 0.5) & (F.col("pred_lang") == "en")
    ).localCheckpoint(eager=False)
    keep = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # explicit hint: the checkpointed frame carries no stats, so AQE
    # can't discover the broadcast on its own (measured: it falls back
    # to a shuffled join, 2 extra exchanges)
    survivors = scored.join(F.broadcast(keep), ["fp", "doc_id"])
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


ORACLE_CURATION = rf"""
WITH q AS ({ORACLE_DOC_QUALITY}),
l AS ({ORACLE_DOC_LANG}),
base AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END
           AS n_tokens,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
scored AS (
  SELECT base.* FROM base
  JOIN q USING (doc_id) JOIN l USING (doc_id)
  WHERE q.quality >= 0.5 AND l.pred_lang = 'en'
),
keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM scored GROUP BY fp)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM scored JOIN keep USING (fp, doc_id)
GROUP BY source ORDER BY source
"""


def q_tfidf_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine near-dup pairs: the bag-of-words detector —
    word order ignored, so reordered/reshuffled copies land at
    cosine ~1 where shingle methods (minhash/winnowing) score low."""
    from hummingbird_spark.operators.dedup import tfidf_cosine_pairs

    d = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(d, threshold=0.9, max_doc_freq=1000)


ORACLE_TFIDF = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), dfreq AS (
  SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term
  HAVING COUNT(*) <= 1000
), w AS (
  SELECT doc_id, tf.term,
         CAST(tf AS DECIMAL(18,0))
           * CAST(floor(ln(n_docs / df_t) * 1e6 + 0.5) AS DECIMAL(18,0))
           AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), norms AS (
  SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS norm
  FROM w GROUP BY doc_id
), dots AS (
  SELECT x.doc_id AS a, y.doc_id AS b, SUM(x.w * y.w) AS dot
  FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       floor(CAST(dot AS DOUBLE) / (na.norm * nb.norm) * 1e6 + 0.5) / 1e6
         AS cosine
FROM dots
JOIN norms na ON dots.a = na.doc_id
JOIN norms nb ON dots.b = nb.doc_id
WHERE floor(CAST(dot AS DOUBLE) / (na.norm * nb.norm) * 1e6 + 0.5) / 1e6
      >= 0.9
ORDER BY a, b
"""


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) copy-detection: doc pairs sharing >= 8 selected
    rolling-hash fingerprints, with containment score. The cut sits on
    the corpus's measured cliff: pairs sharing 2-7 fingerprints have
    containment ~0.05 (template noise, ~650k pairs at sf0.1); >= 8 have
    ~0.4-0.5 (real copies, ~234 pairs) — below it the detector output is
    dominated by false positives AND the pair-group shuffle carries 2700x
    more rows."""
    from hummingbird_spark.operators.dedup import winnow_shared_pairs

    d = load_table(spark, sf_dir, "documents")
    return winnow_shared_pairs(d, k=7, window=8, min_shared=8)


# replicates the Spark kernel: normalize to [a-z0-9], polynomial-hash
# every 7-char gram (sum ord(c_j)*B^(6-j) mod MINHASH_P, B=257), keep
# each 8-hash window's minimum, dedupe, drop fingerprints in > 200
# docs, pair-count.
from hummingbird_spark.operators.dedup import WINNOW_B  # noqa: E402

_POLY7 = " + ".join(
    f"ord(substr(s, i + {j}, 1)) * {WINNOW_B ** (7 - 1 - j)}"
    for j in range(7)
)

ORACLE_WINNOW = rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents
), ok AS (
  SELECT doc_id, s FROM norm WHERE length(s) >= 14
), kg AS (
  SELECT doc_id,
         list_transform(range(1, length(s) - 6 + 1),
           i -> ({_POLY7}) % {MINHASH_P}) AS h
  FROM ok
), fps AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - 7 + 1),
           j -> list_min(h[j:j+7]))) AS fp
  FROM kg
), ex AS (
  SELECT doc_id, unnest(fp) AS fp FROM fps
), sizes AS (
  SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), keep AS (
  SELECT fp FROM ex GROUP BY fp HAVING count(*) <= 200
), ex2 AS (
  SELECT ex.doc_id, ex.fp FROM ex JOIN keep USING (fp)
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
  FROM ex2 x JOIN ex2 y ON x.fp = y.fp AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 8
)
SELECT a, b, shared,
       round(CAST(shared AS DOUBLE) /
             CAST(least(na.n, nb.n) AS DOUBLE), 6) AS containment
FROM pairs
JOIN sizes na ON na.doc_id = pairs.a
JOIN sizes nb ON nb.doc_id = pairs.b
ORDER BY a, b
"""


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(d, max_hamming=3, ngram=3)


_SIMHASH_M64 = "18446744073709551616::HUGEINT"  # 2^64


def _wrapmul_sql(z: str, k: int) -> str:
    """SQL for (z * k) mod 2^64 with z < 2^64 and k a 64-bit constant.
    The direct HUGEINT product of two near-2^64 operands overflows
    int128, so split z into 32-bit halves: z*k = zl*k + (zh*k mod 2^32)
    * 2^32 (mod 2^64) — every intermediate stays under 2^96."""
    return (f"((({z}) % 4294967296) * {k}::HUGEINT"
            f" + ((({z}) // 4294967296) * {k}::HUGEINT % 4294967296)"
            f" * 4294967296) % {_SIMHASH_M64}")


def _splitmix64_sql(z: str) -> str:
    """SQL replica of the splitmix64 finalizer (validated term-by-term
    against the numpy kernel over random 64-bit inputs)."""
    s1 = f"(({z}) + 11400714819323198485::HUGEINT) % {_SIMHASH_M64}"
    s2 = _wrapmul_sql(f"xor(({s1}), ({s1}) >> 30)", 0xBF58476D1CE4E5B9)
    s3 = _wrapmul_sql(f"xor(({s2}), ({s2}) >> 27)", 0x94D049BB133111EB)
    return f"xor(({s3}), ({s3}) >> 31)"


def _simhash_oracle_sql() -> str:
    """Full-algorithm DuckDB replica of the SimHash pipeline (same
    strategy as ORACLE_WINNOW's rolling-hash replica): per-word
    codepoint poly hash (FNV64-prime base, mod 2^64 via list_reduce —
    products stay under 2^104 so plain HUGEINT arithmetic suffices) ->
    per-3-gram poly combine -> DISTINCT combined values -> splitmix64
    finalize (the two 64x64 wrap multiplies via _wrapmul_sql's 32-bit
    split) -> per-bit majority vote -> packed signed 64-bit SimHash ->
    4x16-bit banded candidate pairs -> exact hamming via
    bit_count(xor). The 64 vote terms are generated here rather than
    hand-written; the banded candidate join is replicated too (not
    just hamming<=3 over all pairs) so the oracle would catch a
    banding bug that loses a candidate pair.

    Tokenization note: the kernel splits on the exact str.split()
    Unicode-whitespace set, the oracle RE2 '\\s+' (ASCII whitespace).
    They agree on the fixture, which is verified to contain no exotic
    whitespace — a corpus with U+00A0-style separators would need the
    kernel pinned to ASCII splitting first."""
    from hummingbird_spark.operators.dedup import SIMHASH_B

    vote_terms = "\n      + ".join(
        f"(CASE WHEN 2 * SUM(CAST((h >> {i}) & 1 AS BIGINT)) > COUNT(*) "
        f"THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END)"
        for i in range(64)
    )
    wh = ("list_reduce(list_prepend(0::HUGEINT, "
          "list_transform(string_split(w, ''), c -> unicode(c)::HUGEINT)), "
          f"(a, c) -> (a * {SIMHASH_B}::HUGEINT + c) % {_SIMHASH_M64})")
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     w -> w <> '') AS ws
  FROM documents WHERE text IS NOT NULL
), wh AS (
  SELECT doc_id,
         list_transform(ws, w -> {wh}) AS hs
  FROM toks WHERE len(ws) >= 3
), grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(hs) - 1),
                  i -> ((hs[i] * {SIMHASH_B}::HUGEINT + hs[i + 1])
                        % {_SIMHASH_M64} * {SIMHASH_B}::HUGEINT
                        + hs[i + 2]) % {_SIMHASH_M64}))
             AS g
    FROM wh)
), hashed AS (
  SELECT doc_id, {_splitmix64_sql('g')} AS h FROM grams
), sim AS (
  SELECT doc_id,
      {vote_terms} AS up
  FROM hashed GROUP BY doc_id
), signed_sim AS (
  SELECT doc_id, up,
         CAST(CASE WHEN up >= 9223372036854775808::HUGEINT
              THEN up - 18446744073709551616::HUGEINT
              ELSE up END AS BIGINT) AS sh
  FROM sim
), chunked AS (
  SELECT doc_id, sh,
         CAST((up >> (16 * c)) & 65535::HUGEINT AS BIGINT) AS ckey, c
  FROM signed_sim, unnest([0, 1, 2, 3]) AS t(c)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS hamming
  FROM chunked x JOIN chunked y
    ON x.c = y.c AND x.ckey = y.ckey AND x.doc_id < y.doc_id
)
SELECT a, b, hamming FROM cand WHERE hamming <= 3 ORDER BY a, b
"""


ORACLE_SIMHASH_DUPS = _simhash_oracle_sql()


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    e = load_table(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row.embedding]


def q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(e, _query_vec(spark, sf_dir), k=10)


ORACLE_KNN = """
WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
    round(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(q.v) + 1),
           i -> CAST(q.v[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE))))), 6) AS score
  FROM embeddings e, q
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""


_BM25_TERMS = ["spark", "query", "merge"]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval over the corpus: fully relational
    (query-term postings only shuffle; per-term DF broadcast)."""
    from hummingbird_spark.operators.search import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_TERMS, k=15)


_ORACLE_BM25_BODY = r"""
toks AS (
  SELECT doc_id,
         list_transform(
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\s+') END,
           w -> lower(w)) AS ws
  FROM documents
),
lens AS (SELECT doc_id, len(ws) AS dl FROM toks),
corpus AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
postings AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM toks)
  WHERE term IN ('spark', 'query', 'merge')
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM postings GROUP BY term
),
bm25 AS (
  SELECT p.doc_id,
         round(SUM(
           ln(1 + (c.n - d.df_t + 0.5) / (d.df_t + 0.5))
           * p.tf * (1.2 + 1)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / c.avgdl))
         ), 6) AS score
  FROM postings p
  JOIN dfreq d USING (term)
  JOIN lens l USING (doc_id)
  CROSS JOIN corpus c
  GROUP BY p.doc_id
)
"""

ORACLE_BM25 = f"""
WITH {_ORACLE_BM25_BODY}
SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT 15
"""


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 + exact cosine top-20 fused by
    reciprocal rank (rrf_k=60, the $rankFusion constant). Both input
    lists are post-aggregate top-k frames, so every fusion join is
    broadcast-size."""
    from hummingbird_spark.operators.search import bm25_topk, rrf_fuse

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(d, _BM25_TERMS, k=20)
    vec = cosine_topk(e, _query_vec(spark, sf_dir), k=20).select(
        F.col("vec_id").alias("doc_id"), "score")
    return rrf_fuse([lex, vec], k=10)


ORACLE_HYBRID_RRF = f"""
WITH {_ORACLE_BM25_BODY},
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM (SELECT doc_id, score FROM bm25
        ORDER BY score DESC, doc_id LIMIT 20) t
),
q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
cos AS (
  SELECT e.vec_id AS doc_id,
    round(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE)
                * CAST(e.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(q.v) + 1),
           i -> CAST(q.v[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE))))), 6)
      AS score
  FROM embeddings e, q
),
vec AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM (SELECT doc_id, score FROM cos
        ORDER BY score DESC, doc_id LIMIT 20) t
),
contrib AS (
  SELECT doc_id, 1.0 / (60 + rnk) AS c FROM lex
  UNION ALL
  SELECT doc_id, 1.0 / (60 + rnk) AS c FROM vec
)
SELECT doc_id, round(SUM(c), 6) AS rrf_score
FROM contrib GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id LIMIT 10
"""


_PPL_CAP = 500  # binds at sf0.01 (916 distinct bigrams -> 416 pruned)


def q_perplexity_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: bigram perplexity under the
    corpus's own add-alpha LM; the 20 most-perplexed docs are the
    gibberish/outlier cut surface.

    HEADLINE = the capped configuration (vocab_top_k, r4-verdict scale
    item): the bigram table is the Heaps-law growth term at 100 TB, so
    the deployable form bounds it to the top-K bigrams and broadcasts
    the model — the probe side never shuffles for the join. The cap is
    chosen to BIND at sf0.01 so the pruned-bigram scoring path is
    under the oracle, not just the trivial K>=vocab case;
    perplexity_outliers_exact keeps the uncapped model hash-proven."""
    from hummingbird_spark.operators.search import bigram_perplexity

    d = load_table(spark, sf_dir, "documents")
    return (
        bigram_perplexity(d, vocab_top_k=_PPL_CAP)
        .orderBy(F.desc("perplexity"), "doc_id")
        .limit(20)
    )


def q_perplexity_outliers_exact(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Uncapped bigram perplexity — the exact model the capped
    headline approximates (capped ppl >= exact ppl; equality when K
    covers the vocabulary)."""
    from hummingbird_spark.operators.search import bigram_perplexity

    d = load_table(spark, sf_dir, "documents")
    return (
        bigram_perplexity(d)
        .orderBy(F.desc("perplexity"), "doc_id")
        .limit(20)
    )


_PPL_ORACLE_BODY = r"""
WITH toks AS (
  SELECT doc_id,
         list_transform(
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\s+') END,
           w -> lower(w)) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM toks
),
bi AS (SELECT bg, COUNT(*) AS b_cnt FROM grams GROUP BY bg),
bik AS (SELECT bg, b_cnt FROM bi {cap_clause}),
uni AS (
  SELECT string_split(bg, ' ')[1] AS w1, COUNT(*) AS u_cnt
  FROM grams GROUP BY 1
),
vv AS (SELECT COUNT(*) AS v FROM uni)
SELECT doc_id,
       round(exp(AVG(-ln((COALESCE(k.b_cnt, 0) + 0.1)
                          / (u.u_cnt + 0.1 * vv.v)))), 4)
         AS perplexity,
       COUNT(*) AS n_bigrams
FROM grams g
LEFT JOIN bik k USING (bg)
JOIN uni u ON u.w1 = string_split(g.bg, ' ')[1]
CROSS JOIN vv
GROUP BY doc_id
ORDER BY perplexity DESC, doc_id LIMIT 20
"""

# same deterministic top-K tie-break as the Spark side (desc count,
# then bigram text); pruned bigrams score as unseen via COALESCE(...,0)
ORACLE_PERPLEXITY = _PPL_ORACLE_BODY.format(
    cap_clause=f"ORDER BY b_cnt DESC, bg LIMIT {_PPL_CAP}")
ORACLE_PERPLEXITY_EXACT = _PPL_ORACLE_BODY.format(cap_clause="")


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (MinHash+LSH,
    jaccard>=0.7) attributed to their sources — the provenance signal
    that tells a mixture designer WHICH sources mirror each other
    (unordered source pair, so A<->B counts once). The pair frame is
    tiny; both source joins are broadcast-size."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        d, threshold=0.7, num_hashes=16, bands=4, ngram=3)
    src = d.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("a"),
                    F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("b"),
                    F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select(
            F.least("src_a", "src_b").alias("source_1"),
            F.greatest("src_a", "src_b").alias("source_2"),
        )
        .groupBy("source_1", "source_2")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
        .orderBy(F.desc("n_dup_pairs"), "source_1", "source_2")
    )


ORACLE_CROSS_SOURCE = f"""
WITH pairs AS ({ORACLE_MINHASH}),
attributed AS (
  SELECT least(da.source, db.source) AS source_1,
         greatest(da.source, db.source) AS source_2
  FROM pairs p
  JOIN documents da ON da.doc_id = p.a
  JOIN documents db ON db.doc_id = p.b
)
SELECT source_1, source_2, COUNT(*) AS n_dup_pairs
FROM attributed GROUP BY source_1, source_2
ORDER BY n_dup_pairs DESC, source_1, source_2
"""


def q_lm_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LM data prep in ONE plan: quality+language filter ->
    non-overlapping 64-token chunks -> deterministic-order packing
    into 256-token sequences -> per-pack accounting. The composition
    the chunk/curate/pack pieces exist FOR; every stage is the
    already-oracle-verified operator, chained."""
    from hummingbird_spark.functions.text import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(
        (quality_score(F.col("text")) >= 0.5)
        & (lang_id(F.col("text")) == "en"))
    chunks = chunk_documents(kept, max_tokens=64, stride=64)
    ordered = chunks.withColumn(
        "ord_key",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_"),
                       F.col("chunk_id").cast("string"))))
    w = Window.orderBy("ord_key", "doc_id", "chunk_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    pack = F.floor(
        (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(256))
    return (
        ordered.withColumn("pack_id", pack)
        .groupBy("pack_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum("n_tokens").alias("n_tokens"))
        .orderBy("pack_id")
    )


ORACLE_LM_DATA_PREP = rf"""
WITH q AS ({ORACLE_DOC_QUALITY}),
l AS ({ORACLE_DOC_LANG}),
kept AS (
  SELECT d.doc_id,
         CASE WHEN length(trim(d.text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(d.text), '\s+') END AS ws
  FROM documents d
  JOIN q USING (doc_id) JOIN l USING (doc_id)
  WHERE q.quality >= 0.5 AND l.pred_lang = 'en'
),
spans AS (
  SELECT doc_id, len(ws) AS n,
         CASE WHEN len(ws) <= 0 THEN 0
              ELSE CAST(ceil(greatest(len(ws) - 64, 0) / 64.0) AS INT)
                   + 1 END AS n_chunks
  FROM kept
),
chunks AS (
  SELECT doc_id,
         CAST(unnest(range(n_chunks)) AS INT) AS chunk_id,
         n
  FROM spans WHERE n_chunks > 0
),
sized AS (
  SELECT doc_id, chunk_id,
         least(chunk_id * 64 + 64, n) - chunk_id * 64 AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || '_'
             || CAST(chunk_id AS VARCHAR)) AS ord_key
  FROM chunks
),
packed AS (
  SELECT doc_id, chunk_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY ord_key, doc_id,
                                         chunk_id
                                         ROWS UNBOUNDED PRECEDING)
                     - n_tokens) / 256) AS BIGINT) AS pack_id
  FROM sized
)
SELECT pack_id, COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM packed GROUP BY pack_id ORDER BY pack_id
"""


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE (30 merges trained on the corpus's word types) ->
    per-source fertility (subword tokens per word) — the number that
    sizes an LM token budget per data source. Iterative training is
    the documented non-SQL-expressible category (rows-only);
    correctness is pinned by the differential test vs the published
    algorithm (tests/test_bpe.py)."""
    from hummingbird_spark.operators.bpe import (
        bpe_token_counts,
        train_bpe,
    )

    d = load_table(spark, sf_dir, "documents")
    _, seg = train_bpe(d, n_merges=20)
    counts = bpe_token_counts(d, seg)
    return (
        counts.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_bpe_tokens").alias("bpe_tokens"),
            F.sum("n_words").alias("words"),
            F.round(F.sum("n_bpe_tokens")
                    / F.sum("n_words").cast("double"), 4)
            .alias("fertility"),
        )
        .orderBy("source")
    )


def q_vector_search_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo $vectorSearch run verbatim through the pipeline
    translator (exact path): identical semantics to knn_exact, so the
    brute-force oracle is a true equivalent — proving the Atlas
    vector-search surface end-to-end through the driver gate."""
    from hummingbird_spark.pipeline import mongo_pipeline_to_df

    e = load_table(spark, sf_dir, "embeddings")
    return mongo_pipeline_to_df(e, [
        {"$vectorSearch": {"path": "embedding",
                           "queryVector": _query_vec(spark, sf_dir),
                           "limit": 10, "exact": True}},
        {"$project": {"vec_id": 1,
                      "score": {"$meta": "vectorSearchScore"}}},
        {"$sort": {"score": -1, "vec_id": 1}},
    ])


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, _query_vec(spark, sf_dir), k=10, n_planes=8,
                    probe_hamming=2)


def _knn_lsh_oracle_sql() -> str:
    """Full-algorithm DuckDB replica of lsh_topk at the registry
    parameters (n_planes=8, probe_hamming=2, seed=42, k=10): the
    seeded Gaussian hyperplanes are a deterministic 8x64 matrix
    (random.Random(42).gauss — data-independent), inlined as float
    literals; each vector's sign-bit bucket and the query's bucket are
    computed with the same expression, and the probe set 'every bucket
    within hamming 2' is expressed directly as
    bit_count(xor(bucket, qbucket)) <= 2 — equivalent to the Spark
    side's driver-enumerated bucket list. Sign decisions are robust to
    float fold-order differences (Gaussian dots are O(1), never within
    1e-12 of zero on the fixture), and the final rescore reuses the
    exact-cosine shape knn_exact's oracle already hash-matches."""
    from hummingbird_spark.operators.similarity import random_hyperplanes

    dim = 64  # embeddings fixture dimension (TESTDATA.md)
    planes = random_hyperplanes(dim, n_planes=8, seed=42)

    def bucket_expr(vec: str) -> str:
        terms = []
        for j, pl in enumerate(planes):
            lits = ", ".join(repr(float(x)) for x in pl)
            dot = (f"list_sum(list_transform(range(1, {dim + 1}), "
                   f"i -> CAST({vec}[i] AS DOUBLE) * ([{lits}])[i]))")
            terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} "
                         f"ELSE 0 END)")
        return "\n      + ".join(terms)

    return f"""
WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
qb AS (
  SELECT {bucket_expr('v')} AS b FROM q
), bucketed AS (
  SELECT vec_id, embedding,
         {bucket_expr('embedding')} AS b
  FROM embeddings
), probed AS (
  SELECT e.vec_id, e.embedding
  FROM bucketed e, qb WHERE bit_count(xor(e.b, qb.b)) <= 2
), scored AS (
  SELECT e.vec_id,
    round(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE)
                * CAST(e.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(q.v) + 1),
           i -> CAST(q.v[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE))))),
      6) AS score
  FROM probed e, q
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""


ORACLE_KNN_LSH = _knn_lsh_oracle_sql()


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed top-k: score only the nprobe nearest inverted lists
    (the partition-pruned ANN scale path; approximate, rows-only).

    nprobe=6 of 16 lists: measured recall@10 on the fixture is 0.9
    (sf0.001) / 1.0 (sf0.01) vs 0.7 at nprobe=4 — the fixture's
    embeddings are structureless (max pairwise cosine ~0.61), so the
    true neighbors spread across lists and a deeper probe is the right
    quality/pruning point; tests/test_ann_recall.py pins the floor."""
    from hummingbird_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, _query_vec(spark, sf_dir), k=10, n_centroids=16,
                    nprobe=6)


def q_embedding_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs, exact (blocked broadcast
    matmul, per-block top-k, global TakeOrdered) — so the brute-force
    oracle is a true equivalent; the LSH-pruned variant is
    near_duplicate_pairs with n_planes>0 (approximate, rows-only).

    Top-k instead of a threshold cut because the synthetic embeddings
    have NO pairs above cosine 0.61 at any SF — a thresholded query
    would pass its oracle vacuously (0 rows). The thresholded operator
    (exact_near_duplicate_pairs(threshold=...)) stays unit-tested on a
    corpus with planted near-duplicates."""
    e = load_table(spark, sf_dir, "embeddings")
    return exact_near_duplicate_pairs(e, top_k=20)


_EMB_PAIRS_SQL = """
  SELECT x.vec_id AS a, y.vec_id AS b,
    round(
      list_sum(list_transform(range(1, len(x.embedding) + 1),
        i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(x.embedding) + 1),
           i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(y.embedding) + 1),
           i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))), 6)
      AS cosine
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
"""

ORACLE_EMB_NEAR_DUP = f"""
WITH pairs AS ({_EMB_PAIRS_SQL})
SELECT a, b, cosine FROM pairs ORDER BY cosine DESC, a, b LIMIT 20
"""


def q_segment_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc segment-level exact dedup signal: per doc, the
    fraction of its disjoint 10-word blocks that appear verbatim in
    another document (paragraph-dedup analogue on flat text; planted
    duplicate docs surface with dup_fraction ~1). Docs with at least
    one duplicated segment only, to keep the result the actionable
    cut-list."""
    from hummingbird_spark.operators.dedup import segment_duplicate_stats

    d = load_table(spark, sf_dir, "documents")
    return (
        segment_duplicate_stats(d, window=10)
        .filter(F.col("n_dup_segments") > 0)
        .orderBy(F.desc("dup_fraction"), "doc_id")
    )


ORACLE_SEGMENT_DUP = r"""
WITH words AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
),
segs AS (
  SELECT doc_id,
         md5(array_to_string(ws[i.i*10+1 : i.i*10+10], ' ')) AS segment
  FROM words,
       LATERAL (SELECT unnest(range(CAST(floor(len(ws)/10) AS BIGINT)))
                AS i) i
),
seg_docs AS (
  SELECT segment, COUNT(DISTINCT doc_id) AS nd FROM segs GROUP BY segment
),
per_doc AS (
  SELECT s.doc_id,
         COUNT(*) AS n_segments,
         CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_segments
  FROM segs s JOIN seg_docs d USING (segment)
  GROUP BY s.doc_id
)
SELECT doc_id, n_segments, n_dup_segments,
       round(n_dup_segments / CAST(n_segments AS DOUBLE), 6)
         AS dup_fraction
FROM per_doc
WHERE n_dup_segments > 0
ORDER BY dup_fraction DESC, doc_id
"""


def q_quality_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters (MinHash ->
    connected components) keep their HIGHEST-quality member (ties ->
    min doc_id) instead of the min-id one — the policy real curation
    runs use, since the duplicate kept is the one that trains. Returns
    one row per non-singleton cluster with the winner and its score.
    Plan: the cluster frame is tiny (only docs in dup pairs); the
    quality join hits it broadcast-size, then one rank-1 window per
    cluster."""
    from hummingbird_spark.operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        d, threshold=0.7, num_hashes=16, bands=4, ngram=3)
    labels = connected_components(pairs, "a", "b")
    scored = labels.join(
        d.select(F.col("doc_id").alias("node"),
                 quality_score(F.col("text")).alias("quality")),
        "node")
    w = Window.partitionBy("label").orderBy(
        F.desc("quality"), F.asc("node"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("label").alias("cluster_id"),
            F.col("node").alias("keep_id"),
            F.col("quality").alias("keep_quality"),
        )
        .orderBy("cluster_id")
    )


ORACLE_QUALITY_CANONICAL = f"""
WITH RECURSIVE pairs AS ({ORACLE_MINHASH}),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, root) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
q AS ({ORACLE_DOC_QUALITY}),
ranked AS (
  SELECT comp.cluster_id, comp.node, q.quality,
         ROW_NUMBER() OVER (PARTITION BY comp.cluster_id
                            ORDER BY q.quality DESC, comp.node)
           AS rn
  FROM comp JOIN q ON q.doc_id = comp.node
)
SELECT cluster_id, node AS keep_id, quality AS keep_quality
FROM ranked WHERE rn = 1 ORDER BY cluster_id
"""


def q_classifier_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter rollup: hashed-linear classifier
    score per doc (scan-side, no shuffle), then per-source keep-rate at
    the 0.5 cut — the pipeline view a mixture designer reads before
    setting per-source sampling rates."""
    from hummingbird_spark.functions.text import hashed_classifier_score

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "source", hashed_classifier_score(F.col("text")).alias("score"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0))
            .alias("n_keep"),
        )
        .withColumn("keep_rate",
                    F.round(F.col("n_keep")
                            / F.col("n_docs").cast("double"), 6))
        .orderBy("source")
    )


ORACLE_CLASSIFIER_MIX = r"""
WITH scored AS (
  SELECT source,
    round(1.0 / (1.0 + exp(-(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      list_sum(list_transform(ws, w ->
        (('0x' || substr(md5('qcls-v1' || lower(w)), 1, 15))::BIGINT
         % 1024) / 1023.0 - 0.5)) / len(ws) * 4.0 END))), 6) AS score
  FROM (
    SELECT source,
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\s+') END AS ws
    FROM documents
  )
)
SELECT source, COUNT(*) AS n_docs,
       round(AVG(score), 6) AS avg_score,
       CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keep,
       round(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate
FROM scored GROUP BY source ORDER BY source
"""


def q_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup clusters (SemDeDup shape): exact blocked-cosine
    top-50 pairs -> connected components -> per-cluster size rollup.
    Top-k pairs rather than a threshold cut for the same reason as
    embedding_top_pairs (no synthetic pairs above cosine 0.61);
    singletons are dropped so the output is the duplicate-group
    inventory, mirroring dup_clusters for the embedding modality."""
    from hummingbird_spark.operators.similarity import (
        embedding_duplicate_clusters,
    )

    e = load_table(spark, sf_dir, "embeddings")
    labels = embedding_duplicate_clusters(e, method="exact", top_k=50)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
        .orderBy(F.desc("cluster_size"), "cluster_id")
    )


ORACLE_EMB_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT a, b FROM ({_EMB_PAIRS_SQL} ORDER BY cosine DESC, a, b LIMIT 50) t
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, root) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, COUNT(*) AS cluster_size
FROM comp GROUP BY cluster_id
ORDER BY cluster_size DESC, cluster_id
"""


TEXT_QUERIES: dict[str, tuple] = {
    "doc_stats": (q_doc_stats, ORACLE_DOC_STATS,
                  "token count + fingerprint (text analysis)"),
    "doc_quality": (q_doc_quality, ORACLE_DOC_QUALITY,
                    "quality scoring heuristic"),
    "doc_bpe_tokens": (q_doc_bpe_tokens, ORACLE_DOC_BPE,
                       "BPE-ish sub-word token counting"),
    "percentiles": (q_percentiles, ORACLE_PERCENTILES,
                    "exact interpolated percentiles per group"),
    "doc_lang_id": (q_doc_lang_id, ORACLE_DOC_LANG,
                    "marker-based language ID"),
    "dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT,
                    "exact dedup via normalized fingerprint"),
    "exact_dup_groups": (q_exact_dup_groups, ORACLE_DUP_GROUPS,
                         "duplicate group inventory"),
    "dup_group_histogram": (q_dup_group_histogram, ORACLE_DUP_HISTOGRAM,
                            "fingerprint group-size histogram"),
    "minhash_dups": (q_minhash_dups, ORACLE_MINHASH,
                     "MinHash+LSH near-dup with jaccard verify"),
    "dup_clusters": (q_dup_clusters, ORACLE_DUP_CLUSTERS,
                     "near-dup connected components (clusters)"),
    "token_diversity": (q_token_diversity, ORACLE_TOKEN_DIVERSITY,
                        "distinct/total token repetition signal"),
    "gopher_repetition": (q_gopher_repetition, ORACLE_GOPHER_REPETITION,
                          "Gopher A1.2 repetition filters: dup-line "
                          "fractions + top/duplicated n-gram char "
                          "fractions with the paper's thresholds"),
    "hash_sample": (q_hash_sample, ORACLE_HASH_SAMPLE,
                    "deterministic hash-mod sampling + rollup"),
    "ngram_jaccard": (q_ngram_jaccard, ORACLE_NGRAM_JACCARD,
                      "n-gram Jaccard scores for band candidates"),
    "corpus_curation": (q_corpus_curation, ORACLE_CURATION,
                        "composed curation: quality+lang+dedup+rollup"),
    "tfidf_dup_pairs": (q_tfidf_dup_pairs, ORACLE_TFIDF,
                        "TF-IDF cosine near-dup (bag-of-words)"),
    "winnow_pairs": (q_winnow_pairs, ORACLE_WINNOW,
                     "winnowing rolling-hash copy detection (MOSS)"),
    "simhash_dups": (q_simhash_dups, ORACLE_SIMHASH_DUPS,
                     "SimHash near-dup (banded hamming, full SQL "
                     "replica oracle)"),
    "knn_exact": (q_knn_exact, ORACLE_KNN,
                  "brute-force cosine top-k"),
    "knn_lsh": (q_knn_lsh, ORACLE_KNN_LSH,
                "LSH-pruned cosine top-k (full SQL replica oracle)"),
    "knn_ivf": (q_knn_ivf, None,
                "IVF inverted-list cosine top-k (approximate; rows-only)"),
    "embedding_top_pairs": (q_embedding_top_pairs, ORACLE_EMB_NEAR_DUP,
                            "exact top-k most-similar embedding pairs"),
    "embedding_dup_clusters": (q_embedding_dup_clusters, ORACLE_EMB_CLUSTERS,
                               "semantic-dedup clusters (CC over cosine "
                               "pairs)"),
    "segment_dup_stats": (q_segment_dup_stats, ORACLE_SEGMENT_DUP,
                          "per-doc duplicate-segment fraction "
                          "(paragraph-level dedup signal)"),
    "classifier_quality_mix": (q_classifier_quality_mix,
                               ORACLE_CLASSIFIER_MIX,
                               "hashed-linear classifier keep-rate "
                               "per source"),
    "quality_canonical_dedup": (q_quality_canonical_dedup,
                                ORACLE_QUALITY_CANONICAL,
                                "best-quality doc kept per near-dup "
                                "cluster"),
    "vector_search_pipeline": (q_vector_search_pipeline, ORACLE_KNN,
                               "$vectorSearch stage through the "
                               "pipeline translator (exact path)"),
    "bm25_topk": (q_bm25_topk, ORACLE_BM25,
                  "BM25 lexical retrieval (relational postings)"),
    "hybrid_rrf": (q_hybrid_rrf, ORACLE_HYBRID_RRF,
                   "hybrid BM25+vector reciprocal-rank fusion"),
    "perplexity_outliers": (q_perplexity_outliers, ORACLE_PERPLEXITY,
                            "bigram-LM perplexity quality filter "
                            "(CCNet shape; capped+broadcast model — "
                            "the 100 TB configuration)"),
    "perplexity_outliers_exact": (q_perplexity_outliers_exact,
                                  ORACLE_PERPLEXITY_EXACT,
                                  "uncapped bigram-LM perplexity "
                                  "(exact model)"),
    "bpe_fertility": (q_bpe_fertility, None,
                      "trained-BPE subword fertility per source "
                      "(iterative; rows-only)"),
    "lm_data_prep": (q_lm_data_prep, ORACLE_LM_DATA_PREP,
                     "end-to-end filter -> chunk -> pack composition"),
    "cross_source_dups": (q_cross_source_dups, ORACLE_CROSS_SOURCE,
                          "cross-source near-dup provenance matrix"),
}
