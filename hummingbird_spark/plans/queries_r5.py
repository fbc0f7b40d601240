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


# ---------------------------------------------------------------------------
# Distributed k-means (late r5): full-corpus Lloyd's over the embeddings
# table — semantic bucketing for cluster-balanced sampling / per-cluster
# curation. The integer-quantized discipline (operators/cluster.py) makes
# the whole T-iteration trajectory EXACT in both engines, so the oracle
# unrolls the iterations as CTEs and hash-matches bit-for-bit.
_KM_K = 8
_KM_T = 3
_KM_DIM = 64


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.cluster import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(e, k=_KM_K, iterations=_KM_T).orderBy("vec_id")


def q_kmeans_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.cluster import kmeans_sizes

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_sizes(e, k=_KM_K, iterations=_KM_T).orderBy("cluster")


def _kmeans_cte(k: int, t: int, dim: int) -> str:
    """Unrolled-iteration replica of operators/cluster.py: quantize ->
    md5-seed init -> T x (integer-distance assign, integer-mean update
    with empty-cluster carry) -> final assign. All-integer, so the
    replay is exact, not approximate."""
    parts = [f"""
q AS (
  SELECT e.vec_id, r.i AS dim,
         round(e.embedding[r.i]::DOUBLE * 1000000.0)::BIGINT AS x
  FROM embeddings e, (SELECT unnest(range(1, {dim + 1})) AS i) r
),
seeds AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cluster
  FROM embeddings
  QUALIFY cluster < {k}
),
cent0 AS (
  SELECT s.cluster, q.dim, q.x AS c
  FROM seeds s JOIN q USING (vec_id)
)"""]
    for i in range(1, t + 2):
        parts.append(f"""
d{i} AS (
  SELECT q.vec_id, c.cluster, SUM((q.x - c.c) * (q.x - c.c)) AS d2
  FROM q JOIN cent{i - 1} c USING (dim)
  GROUP BY 1, 2
),
a{i} AS (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cluster) AS rn
  FROM d{i}
  QUALIFY rn = 1
)""")
        if i <= t:  # the (t+1)-th assignment is final — no update
            parts.append(f"""
u{i} AS (
  SELECT a.cluster, q.dim, SUM(q.x) AS s, COUNT(*) AS n
  FROM a{i} a JOIN q USING (vec_id)
  GROUP BY 1, 2
),
cent{i} AS (
  SELECT p.cluster, p.dim,
         CASE WHEN u.s IS NULL THEN p.c
              WHEN u.s >= 0 THEN (2 * u.s + u.n) // (2 * u.n)
              ELSE -((-2 * u.s + u.n) // (2 * u.n)) END AS c
  FROM cent{i - 1} p LEFT JOIN u{i} u USING (cluster, dim)
)""")
    return ",".join(parts)


ORACLE_KMEANS_ASSIGN = f"""
WITH {_kmeans_cte(_KM_K, _KM_T, _KM_DIM)}
SELECT vec_id, cluster, d2::BIGINT AS dist2
FROM a{_KM_T + 1}
ORDER BY vec_id
"""

ORACLE_KMEANS_SIZES = f"""
WITH {_kmeans_cte(_KM_K, _KM_T, _KM_DIM)}
SELECT cluster, COUNT(*) AS n,
       round(AVG(d2), 2) AS mean_dist2
FROM a{_KM_T + 1}
GROUP BY cluster
ORDER BY cluster
"""

# Cluster-balanced sampling: uniform n-per-cluster md5-order draw with
# the two-phase (cutoff filter -> survivor-only window) skew guard; the
# oracle replicates the cutoff arithmetic double-for-double.
_KM_NPER = 25

ORACLE_CLUSTER_SAMPLE = f"""
WITH {_kmeans_cte(_KM_K, _KM_T, _KM_DIM)},
counts AS (
  SELECT cluster, COUNT(*) AS n FROM a{_KM_T + 1} GROUP BY 1
),
cut AS (
  SELECT cluster,
         CASE WHEN n <= 4 * {_KM_NPER} THEN 'ffffffff'
              ELSE printf('%08x',
                     CAST(trunc(((4.0 * {_KM_NPER}) / n) * 4294967295)
                          AS BIGINT))
         END AS cutoff
  FROM counts
),
surv AS (
  SELECT a.vec_id, a.cluster, a.d2,
         md5(CAST(a.vec_id AS VARCHAR)) AS h
  FROM a{_KM_T + 1} a JOIN cut USING (cluster)
  WHERE substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8) <= cut.cutoff
),
ranked AS (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY h, vec_id) AS rn
  FROM surv
)
SELECT vec_id, cluster, d2::BIGINT AS dist2
FROM ranked WHERE rn <= {_KM_NPER}
ORDER BY cluster, vec_id
"""


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.cluster import cluster_balanced_sample

    e = load_table(spark, sf_dir, "embeddings")
    return cluster_balanced_sample(
        e, k=_KM_K, n_per_cluster=_KM_NPER, iterations=_KM_T,
    ).orderBy("cluster", "vec_id")


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney trigram perplexity (late r5): the published-
# standard LM smoothing (Chen & Goodman 1998, the KenLM/CCNet filter).
# The oracle mirrors the count hierarchy and the probability expression
# tree verbatim; only the per-doc weighted mean is order-dependent and
# it rounds to 4 dp (same discipline as perplexity_outliers).
_KN_D = 0.75


def q_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.search import kn_trigram_perplexity

    d = load_table(spark, sf_dir, "documents")
    return kn_trigram_perplexity(d, discount=_KN_D).orderBy("doc_id")


# the KN count-hierarchy + model CTE chain, exposed for reuse by the
# r8 composite oracle (curation_composite_weights) — the
# link_canonical_docs shared-prefix pattern
KN_MODEL_CTES = rf"""toks AS (
  SELECT doc_id,
         list_transform(
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\s+') END,
           w -> lower(w)) AS ws
  FROM documents
),
occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
  FROM toks
  WHERE len(ws) >= 3
),
doc_tg AS MATERIALIZED (
  SELECT doc_id, tg, COUNT(*) AS d_cnt FROM occ GROUP BY 1, 2
),
c3 AS MATERIALIZED (
  SELECT tg, SUM(d_cnt) AS c3,
         string_split(tg, ' ')[1] AS u,
         string_split(tg, ' ')[2] AS v,
         string_split(tg, ' ')[3] AS w
  FROM doc_tg GROUP BY tg
),
ctx2 AS (
  SELECT u, v, SUM(c3) AS c2uv, COUNT(*) AS n1p_uv
  FROM c3 GROUP BY 1, 2
),
cont AS MATERIALIZED (
  SELECT v, w, COUNT(*) AS ncont FROM c3 GROUP BY 1, 2
),
midv AS (
  SELECT v, SUM(ncont) AS n1p_v_mid, COUNT(*) AS n1p_v
  FROM cont GROUP BY 1
),
unic AS (
  SELECT w, COUNT(*) AS n1p_w FROM cont GROUP BY 1
),
ntypes AS (
  SELECT COUNT(*) AS nt2 FROM cont
),
model AS (
  SELECT c3.tg,
         -ln(
           greatest(c3.c3 - {_KN_D}, 0.0) / ctx2.c2uv
           + {_KN_D} * ctx2.n1p_uv / ctx2.c2uv
             * (greatest(cont.ncont - {_KN_D}, 0.0) / midv.n1p_v_mid
                + {_KN_D} * midv.n1p_v / midv.n1p_v_mid
                  * (unic.n1p_w / ntypes.nt2))
         ) AS nll
  FROM c3
  JOIN ctx2 USING (u, v)
  JOIN cont USING (v, w)
  JOIN midv USING (v)
  JOIN unic USING (w)
  CROSS JOIN ntypes
)"""

ORACLE_KN_PERPLEXITY = rf"""
WITH {KN_MODEL_CTES}
SELECT d.doc_id,
       round(exp(SUM(d.d_cnt * m.nll) / SUM(d.d_cnt)), 4)
         AS kn_perplexity,
       SUM(d.d_cnt)::BIGINT AS n_trigrams
FROM doc_tg d JOIN model m USING (tg)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


# Capped (deployable) KN variant: top-K trigram NLLs broadcast; pruned
# trigrams score through the same formula with c3=0 (the natural
# backoff) via the exact lower-order tables. The cap removes exactly
# the hot keys from the pruned-tail joins. K binds at every fixture
# scale (sf0.001 already has ~16.5k trigram types).
_KN_TOPK = 2000


def q_kn_perplexity_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.search import kn_trigram_perplexity

    d = load_table(spark, sf_dir, "documents")
    return kn_trigram_perplexity(
        d, discount=_KN_D, model_top_k=_KN_TOPK).orderBy("doc_id")


ORACLE_KN_PERPLEXITY_CAPPED = ORACLE_KN_PERPLEXITY.replace(
    """model AS (
  SELECT c3.tg,
         -ln(""",
    f"""kept AS (
  SELECT tg FROM c3 ORDER BY c3 DESC, tg LIMIT {_KN_TOPK}
),
model AS (
  SELECT c3.tg,
         CASE WHEN kept.tg IS NULL THEN
           -ln(
             {_KN_D} * ctx2.n1p_uv / ctx2.c2uv
             * (greatest(cont.ncont - {_KN_D}, 0.0) / midv.n1p_v_mid
                + {_KN_D} * midv.n1p_v / midv.n1p_v_mid
                  * (unic.n1p_w / ntypes.nt2))
           )
         ELSE -ln(""").replace(
    """         ) AS nll
  FROM c3""",
    """         ) END AS nll
  FROM c3
  LEFT JOIN kept ON c3.tg = kept.tg""")


# ---------------------------------------------------------------------------
# Semantic decontamination (late r5): embedding-similarity screen vs a
# benchmark slice (label=0 plays the benchmark; the rest is corpus) —
# the paraphrase-leak complement of the n-gram contamination_report.
# Round-then-max makes the result engine-exact under the 6-dp
# discipline; threshold 0.5 bites on the fixture (max pair ~0.61).
_SD_THRESH = 0.5


def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.decontaminate import (
        semantic_contamination,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_contamination(
        e.filter(F.col("label") != 0),
        e.filter(F.col("label") == 0),
        threshold=_SD_THRESH,
    ).orderBy("vec_id")


ORACLE_SEMANTIC_DECON = f"""
WITH corp AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE label <> 0
),
bench AS (
  SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE label = 0
),
sims AS (
  SELECT c.vec_id,
         round(list_cosine_similarity(c.v, b.v), 6) AS s
  FROM corp c CROSS JOIN bench b
),
mx AS (
  SELECT vec_id, MAX(s) AS max_sim FROM sims GROUP BY vec_id
)
SELECT vec_id, max_sim, (max_sim >= {_SD_THRESH}) AS contaminated
FROM mx
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# SCD2 history (late r5): the validity-interval dimension table built
# from the CDC log — completes the CDC state family (cdc_last_state =
# current, cdc_state_at = point-in-time, this = full history with
# unchanged-state collapse). One shuffle, windows only.


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.scd import scd2_history

    e = load_table(spark, sf_dir, "events")
    return scd2_history(
        e, key_cols=["user_id"], ts_col="ts",
        attr_cols=["event_type"], order_cols=["event_id"],
    ).orderBy("user_id", "valid_from")


ORACLE_SCD2_HISTORY = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN row_number() OVER w = 1
                   OR lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS new_ver
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ver AS (
  SELECT *, SUM(new_ver) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS ver
  FROM marked
),
grouped AS (
  SELECT user_id, ver, MIN(event_type) AS event_type,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM ver GROUP BY 1, 2
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER wv AS valid_to,
       (lead(valid_from) OVER wv IS NULL) AS is_current,
       n_events
FROM grouped
WINDOW wv AS (PARTITION BY user_id ORDER BY ver)
ORDER BY user_id, valid_from
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
    "kmeans_assign": (
        q_kmeans_assign, ORACLE_KMEANS_ASSIGN,
        "distributed Lloyd's k-means, exact integer trajectory"),
    "kmeans_sizes": (
        q_kmeans_sizes, ORACLE_KMEANS_SIZES,
        "k-means cluster profile (size, mean dist2)"),
    "kn_perplexity": (
        q_kn_perplexity, ORACLE_KN_PERPLEXITY,
        "interpolated Kneser-Ney trigram perplexity (Chen & Goodman)"),
    "scd2_history": (
        q_scd2_history, ORACLE_SCD2_HISTORY,
        "SCD2 validity intervals from the CDC log, change-collapsed"),
    "cluster_sample": (
        q_cluster_sample, ORACLE_CLUSTER_SAMPLE,
        "cluster-balanced uniform sample, skew-guarded two-phase draw"),
    "kn_perplexity_capped": (
        q_kn_perplexity_capped, ORACLE_KN_PERPLEXITY_CAPPED,
        "KN trigram perplexity, top-K broadcast model + c3=0 backoff"),
    "semantic_decontamination": (
        q_semantic_decontamination, ORACLE_SEMANTIC_DECON,
        "embedding-similarity benchmark screen, broadcast + blocked BLAS"),
}
