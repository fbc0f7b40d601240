"""Round-5 registry queries: DSIR importance resampling (Xie et al.,
NeurIPS 2023) — targeted data SELECTION, the step a mixture designer
runs after dedup/quality filtering to pull raw docs toward a trusted
target distribution. Two queries, both with full DuckDB oracles that
replicate the hashed-ngram models, the add-alpha log-ratio scoring,
and the derived Gumbel noise bit-for-bit:

  dsir_logweights — every doc's importance log-weight toward the
      lang='en' target slice (the model math, full-corpus coverage);
  dsir_selection  — Gumbel top-k sample without replacement
      proportional to those weights (the published selection rule);
  dsir_selection_distributed — the SAME k rows through the huge-k
      quantile-cutoff path (no driver-side top-k merge), hash-matched
      against the identical LIMIT-k oracle: the proof that the
      deployable 10^9-doc selection path computes the published rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbird_spark.operators.dsir import (
    DSIR_MOD,
    dsir_log_weights,
    dsir_select,
    dsir_select_distributed,
)
from hummingbird_spark.sources.tables import load_table

_B = 4096          # hash buckets (paper's 10k variant, scaled down)
_ALPHA = 0.5       # add-alpha smoothing for both multinomials
_K = 50            # selection size
_SEED = "r5"       # Gumbel derivation seed


def q_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        dsir_log_weights(d, F.col("lang") == "en", buckets=_B,
                         alpha=_ALPHA)
        .orderBy("doc_id")
    )


def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dsir_select(d, F.col("lang") == "en", k=_K, buckets=_B,
                       alpha=_ALPHA, seed=_SEED)


def q_dsir_selection_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trim_cap=10 forces the quantile-refinement loop to run even on
    # the fixture corpus (otherwise excess <= cap short-circuits it);
    # the final orderBy is presentation for the hash compare — the
    # operator itself returns an unsorted distributed frame.
    d = load_table(spark, sf_dir, "documents")
    return (
        dsir_select_distributed(d, F.col("lang") == "en", k=_K,
                                buckets=_B, alpha=_ALPHA, seed=_SEED,
                                relative_error=0.01, trim_cap=10)
        .orderBy(F.desc("gumbel_score"), "doc_id")
    )


# Replicates the Spark pipeline exactly: lowercase whitespace tokens,
# unigram+bigram grams, 60-bit-md5-prefix mod B buckets, ONE
# (doc,tgt,bucket) count grain, add-alpha log-ratio model, 6-dp
# rounding before any ordering. Gram-less (empty-text) docs score 0.
_SCORES_CTE = rf"""
toks AS (
  SELECT doc_id, (lang = 'en') AS tgt,
         list_transform(
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\s+') END,
           w -> lower(w)) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, tgt, unnest(ws) AS g FROM toks
  UNION ALL
  SELECT doc_id, tgt,
         unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i+1])) AS g
  FROM toks
),
db AS (
  SELECT doc_id, tgt,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % {_B} AS bkt,
         COUNT(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
model AS (
  SELECT bkt, SUM(cnt) AS raw_cnt,
         SUM(CASE WHEN tgt THEN cnt ELSE 0 END) AS tgt_cnt
  FROM db GROUP BY bkt
),
tot AS (
  SELECT SUM(raw_cnt) AS raw_tot, SUM(tgt_cnt) AS tgt_tot FROM model
),
lr AS (
  SELECT bkt,
         ln((tgt_cnt + {_ALPHA}) / (tgt_tot + {_ALPHA} * {_B}))
         - ln((raw_cnt + {_ALPHA}) / (raw_tot + {_ALPHA} * {_B})) AS lw
  FROM model CROSS JOIN tot
),
scores AS (
  SELECT db.doc_id, round(SUM(db.cnt * lr.lw), 6) AS log_w
  FROM db JOIN lr USING (bkt) GROUP BY db.doc_id
)
"""

ORACLE_DSIR_LOGWEIGHTS = f"""
WITH {_SCORES_CTE}
SELECT d.doc_id, COALESCE(s.log_w, 0.0) AS log_w
FROM documents d LEFT JOIN scores s USING (doc_id)
ORDER BY d.doc_id
"""

# Gumbel top-k: u = (md5_60(seed:id)+1)/(2^60+2), g = -ln(-ln u);
# score = round(log_w + g, 6), ties broken by doc_id.
ORACLE_DSIR_SELECTION = f"""
WITH {_SCORES_CTE},
noisy AS (
  SELECT d.doc_id, COALESCE(s.log_w, 0.0) AS log_w,
         round(COALESCE(s.log_w, 0.0)
               + -ln(-ln(
                   (('0x' || substr(md5('{_SEED}:' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                    + 1.0) / ({float(DSIR_MOD)} + 2.0))), 6)
           AS gumbel_score
  FROM documents d LEFT JOIN scores s USING (doc_id)
)
SELECT doc_id, log_w, gumbel_score
FROM noisy ORDER BY gumbel_score DESC, doc_id LIMIT {_K}
"""


R5_QUERIES: dict = {
    "dsir_logweights": (
        q_dsir_logweights, ORACLE_DSIR_LOGWEIGHTS,
        "DSIR hashed-ngram importance log-weights (Xie et al. 2023)"),
    "dsir_selection": (
        q_dsir_selection, ORACLE_DSIR_SELECTION,
        "DSIR Gumbel top-k importance resampling, derived noise"),
    "dsir_selection_distributed": (
        q_dsir_selection_distributed, ORACLE_DSIR_SELECTION,
        "DSIR huge-k quantile-cutoff selection == LIMIT-k oracle"),
}
