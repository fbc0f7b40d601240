"""Round-8 registry queries.

  video_aligned_dups — temporal alignment on top of the r7
      bag-of-frames video near-dup: per matched video pair, the mode
      of (frame_b - frame_a) over matched frame pairs and the longest
      consecutive frame run at that offset. The fixture plants BOTH
      shapes the distinction exists for: shift-by-2 copies (one
      offset, run 4 -> aligned) and shuffled-frame copies (same
      content bag, offsets scattered, run 1 -> NOT aligned). The
      oracle replays the md5 pixels, the fixed-point DCT (HUGEINT),
      the Hamming match, and the mode/run analytics in one SQL chain.

  curation_composite_weights — the full "quality-weighted mixture"
      composition a real curation run ships: PageRank mass over the
      rare-trigram link graph x trained-classifier score band x
      Kneser-Ney perplexity band -> per-source UniMax mixture weights.
      Composes three already-oracle-proven chains over shared CTE
      prefixes (the link_canonical_docs pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbird_spark.plans.queries_r5 import _KN_D, KN_MODEL_CTES
from hummingbird_spark.plans.queries_r6 import (
    _QC_B,
    _QC_LR,
    _QC_SALT,
    _QC_T,
    _logreg_cte,
    _unimax_cte,
    SCALE_QC,
)
from hummingbird_spark.plans.queries_r7 import (
    _b,
    _GRAPH_CTES,
    _PR_DAMP,
    _PR_ROUNDS,
    _PR_SCALE,
)
from hummingbird_spark.sources.tables import load_table

# tokens(text) in DuckDB — the idiom every text oracle pins
_TOKS = (r"CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] "
         r"ELSE string_split_regex(trim(text), '\s+') END")

VID_N = 24
_VID_SHIFT = 2
_VID_MAX_HAMMING = 6
_VID_MIN_MATCHED = 4
_VID_MIN_RUN = 2


def q_video_aligned_dups(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Frame hashes -> banded Hamming match -> offset-mode +
    longest-consecutive-run alignment scoring."""
    from hummingbird_spark.operators.multimodal import (
        synth_videos_temporal,
        video_alignment,
        video_frame_hashes,
    )

    fh = video_frame_hashes(synth_videos_temporal(spark, VID_N))
    return video_alignment(
        fh, max_hamming=_VID_MAX_HAMMING,
        min_matched_frames=_VID_MIN_MATCHED,
        min_aligned_run=_VID_MIN_RUN)


def _video_aligned_oracle() -> str:
    from hummingbird_spark.operators.multimodal import (
        _IMG_PERT_AMP,
        _IMG_PERT_MOD,
        PHASH_DCT16,
        VID_FRAMES,
    )

    tm = ("[" + ",".join(
        "[" + ",".join(str(v) for v in row) + "]"
        for row in PHASH_DCT16) + "]")
    pw = ("[" + ",".join(str(1 << i) for i in range(64))
          + "]::HUGEINT[]")
    hx = "strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1"
    b0 = f"(({hx.format(p='2*i + 1')}) * 16 + ({hx.format(p='2*i + 2')}))"
    return f"""
WITH ids AS (SELECT mid FROM range({VID_N}) t(mid)),
fr AS (
  SELECT mid, f,
    CASE WHEN (mid % 4 = 1 AND f >= {_VID_SHIFT}) OR mid % 4 = 3
         THEN mid - 1 ELSE mid END AS seed_mid,
    CASE WHEN mid % 4 = 1 AND f >= {_VID_SHIFT} THEN f - {_VID_SHIFT}
         WHEN mid % 4 = 3 THEN (5 * f + 3) % {VID_FRAMES}
         ELSE f END AS sf,
    ((mid % 4 = 1 AND f >= {_VID_SHIFT}) OR mid % 4 = 3) AS pert
  FROM ids, range({VID_FRAMES}) t2(f)
),
hexes AS (
  SELECT mid, f, pert,
         string_agg(md5('vid|' || seed_mid || '|' || sf || '|' || k),
                    '' ORDER BY k) AS hx
  FROM fr, range(16) r(k)
  GROUP BY mid, f, pert, seed_mid, sf
),
px AS (
  SELECT mid, f, list_transform(range(0, 256), i ->
    ({b0} % {255 - _IMG_PERT_AMP})
    + CASE WHEN pert AND i % {_IMG_PERT_MOD} = 0
           THEN {_IMG_PERT_AMP} ELSE 0 END) AS p
  FROM hexes
),
dct AS (
  SELECT mid, f, flatten(list_transform(range(0, 8), u ->
    list_transform(range(0, 8), v ->
      list_sum(list_transform(range(0, 16), y ->
        list_sum(list_transform(range(0, 16), x ->
          ({tm})[u+1][x+1] * p[x*16 + y + 1]))
        * ({tm})[v+1][y+1]))))) AS a
  FROM px
),
med AS (SELECT mid, f, a, list_sort(a) AS s FROM dct),
hashes AS (
  SELECT mid, f,
    CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
         THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
      AS phash
  FROM (
    SELECT mid, f, list_sum(list_transform(range(0, 64), i ->
      CASE WHEN 2 * a[i+1] > s[32] + s[33]
           THEN ({pw})[i+1] ELSE 0::HUGEINT END)) AS h
    FROM med)
),
matched AS (
  SELECT x.mid AS a, y.mid AS b, x.f AS fa, y.f AS fb,
         y.f - x.f AS off
  FROM hashes x JOIN hashes y ON x.mid < y.mid
  WHERE bit_count(xor(x.phash, y.phash)) <= {_VID_MAX_HAMMING}
),
cnt AS (
  SELECT a, b, COUNT(*) AS matched_frames FROM matched GROUP BY a, b
),
md AS (
  SELECT a, b, off AS offset_mode, c AS aligned_frames FROM (
    SELECT a, b, off, COUNT(*) AS c,
      row_number() OVER (PARTITION BY a, b
                         ORDER BY COUNT(*) DESC, off ASC) AS rn
    FROM matched GROUP BY a, b, off) WHERE rn = 1
),
runs AS (
  SELECT a, b, MAX(rl) AS longest_run FROM (
    SELECT a, b, isl, COUNT(*) AS rl FROM (
      SELECT m.a, m.b, m.fa,
        m.fa - row_number() OVER (PARTITION BY m.a, m.b
                                  ORDER BY m.fa) AS isl
      FROM matched m JOIN md
        ON m.a = md.a AND m.b = md.b AND m.off = md.offset_mode)
    GROUP BY a, b, isl)
  GROUP BY a, b
)
SELECT c.a, c.b, c.matched_frames, md.offset_mode, md.aligned_frames,
       r.longest_run, r.longest_run >= {_VID_MIN_RUN} AS aligned
FROM cnt c
JOIN md ON c.a = md.a AND c.b = md.b
JOIN runs r ON c.a = r.a AND c.b = r.b
WHERE c.matched_frames >= {_VID_MIN_MATCHED}
ORDER BY c.a, c.b
"""


ORACLE_VIDEO_ALIGNED = _video_aligned_oracle()


# ---------------------------------------------------------------------------
# Cross-family composite curation score: the full "quality-weighted
# mixture" pipeline a real curation run ships. Per doc, a quality mass
#   q = floor(n_tokens * classifier_score * ppl_band_mult
#             * pagerank_mass / 1e6)
# is quantized to an INTEGER before any cross-row sum (the repo's
# partition-invariance discipline: integer sums commute), then the
# per-source masses feed the UniMax waterfill. The oracle composes the
# three already-proven unrolled chains (PageRank rounds renamed p0..pT
# to dodge the logreg chain's r1..rT) over shared CTE prefixes — the
# link_canonical_docs pattern at three-family width.

_CCW_BUDGET = 58_000.0   # 13 of 20 sf0.01 sources capped, 7 equal-share
_CCW_EPOCHS = 2.0
_CCW_PPL_LO = 19.8       # fixture perplexity terciles (~19.75 / ~21.49)
_CCW_PPL_HI = 21.5
_PR_BASE = _PR_SCALE * (100 - _PR_DAMP) // 100


def q_curation_composite_weights(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """PageRank mass x classifier score x perplexity band -> integer
    per-doc quality mass -> per-source sums -> UniMax mixture
    weights.

    The three chains run eager driver-blocking jobs while they build
    (classifier IRLS collects per iteration, PageRank round
    checkpoints, the KN staging checkpoints) and are fully independent
    until the final join — building them sequentially left the
    cluster idle between one chain's barriers. They build from three
    threads instead (concurrent job submission is thread-safe and the
    documented Spark pattern for exactly this shape); the result
    frames are deterministic either way. Measured 8.9 -> 4.8 s at
    sf0.1; on a cluster the win is the removed inter-chain idle gaps
    (guide §1.2 step 1: fix the distributed shape first)."""
    from concurrent.futures import ThreadPoolExecutor

    from hummingbird_spark.functions.text import token_count
    from hummingbird_spark.operators.classifier import train_and_score
    from hummingbird_spark.operators.graph import (
        pagerank_scaled,
        rare_trigram_edges,
    )
    from hummingbird_spark.operators.mixture import unimax_allocation
    from hummingbird_spark.operators.search import kn_trigram_perplexity

    d = load_table(spark, sf_dir, "documents")

    def build_pr() -> DataFrame:
        return pagerank_scaled(
            rare_trigram_edges(d), rounds=_PR_ROUNDS,
            damping_pct=_PR_DAMP, scale=_PR_SCALE,
        ).select(F.col("node").alias("doc_id"),
                 F.col("rank_scaled").alias("r"))

    def build_cls() -> DataFrame:
        return train_and_score(
            d, F.col("lang") == "en", buckets=_QC_B, iterations=_QC_T,
            lr=_QC_LR, salt=_QC_SALT,
        ).select("doc_id", "score")

    def build_ppl() -> DataFrame:
        return kn_trigram_perplexity(d, discount=_KN_D).select(
            "doc_id", F.col("kn_perplexity").alias("ppl"))

    with ThreadPoolExecutor(max_workers=3) as ex:
        fpr = ex.submit(build_pr)
        fcls = ex.submit(build_cls)
        fppl = ex.submit(build_ppl)
        pr, cls, ppl = fpr.result(), fcls.result(), fppl.result()
    mult = (F.when(F.col("ppl").isNull(), F.lit(2))
            .when(F.col("ppl") <= F.lit(_CCW_PPL_LO), F.lit(3))
            .when(F.col("ppl") <= F.lit(_CCW_PPL_HI), F.lit(2))
            .otherwise(F.lit(1)))
    qmass = (
        d.select("doc_id", "source",
                 token_count(F.col("text")).alias("n_tokens"))
        .join(cls, "doc_id", "left")
        .join(ppl, "doc_id", "left")
        .join(pr, "doc_id", "left")
        .select(
            "source",
            F.floor(
                F.col("n_tokens")
                * F.coalesce(F.col("score"), F.lit(0.5))
                * mult
                * F.coalesce(F.col("r"), F.lit(_PR_BASE))
                / F.lit(1000000.0)).cast("long").alias("q"),
        )
    )
    counts = qmass.groupBy("source").agg(F.sum("q").alias("n_tokens"))
    return (
        unimax_allocation(counts, budget=_CCW_BUDGET,
                          epoch_cap=_CCW_EPOCHS)
        .select(
            "source", F.col("n_tokens").alias("quality_tokens"),
            "capacity", "allocation", "epochs", "weight")
        .orderBy("source")
    )


def _composite_oracle() -> str:
    pr_ctes = [f"p0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r "
               f"FROM deg)"]
    for t in range(1, _PR_ROUNDS + 1):
        pr_ctes.append(
            f"p{t} AS (\n"
            f"  SELECT s.dst AS node,\n"
            f"    CAST({_PR_BASE} + SUM(({_PR_DAMP} * r.r)"
            f" // (100 * d.deg)) AS BIGINT) AS r\n"
            f"  FROM sym s JOIN p{t-1} r ON s.src = r.node\n"
            f"  JOIN deg d ON s.src = d.node\n"
            f"  GROUP BY s.dst)")
    counts_sql = """
  SELECT source, CAST(SUM(q) AS BIGINT) AS n_tokens
  FROM qmass GROUP BY source"""
    return f"""
WITH {_GRAPH_CTES},
{",".join(pr_ctes)},
{_logreg_cte(_QC_B, _QC_T, _QC_LR, _QC_SALT)},
sc AS (
  SELECT d.doc_id,
         round(1.0 / (1.0 + exp(-(
           CAST(SUM(c.cnt * w.w)
                + d.len * (SELECT w FROM w{_QC_T} WHERE b = {_QC_B})
                AS DOUBLE) / (d.len * {SCALE_QC}.0)))), 6) AS score
  FROM cdocs d JOIN ccnts c USING (doc_id)
  JOIN w{_QC_T} w ON w.b = c.bucket
  GROUP BY d.doc_id, d.len
),
{KN_MODEL_CTES},
pplq AS (
  SELECT d.doc_id,
         round(exp(SUM(d.d_cnt * m.nll) / SUM(d.d_cnt)), 4) AS ppl
  FROM doc_tg d JOIN model m USING (tg) GROUP BY d.doc_id
),
qmass AS (
  SELECT d.source,
    CAST(floor(
      len({_TOKS})
      * COALESCE(s.score, 0.5)
      * (CASE WHEN p.ppl IS NULL THEN 2
              WHEN p.ppl <= CAST({_CCW_PPL_LO} AS DOUBLE) THEN 3
              WHEN p.ppl <= CAST({_CCW_PPL_HI} AS DOUBLE) THEN 2
              ELSE 1 END)
      * COALESCE(r.r, {_PR_BASE})
      / 1000000.0) AS BIGINT) AS q
  FROM documents d
  LEFT JOIN sc s USING (doc_id)
  LEFT JOIN pplq p USING (doc_id)
  LEFT JOIN p{_PR_ROUNDS} r ON d.doc_id = r.node
),
{_unimax_cte(_CCW_BUDGET, _CCW_EPOCHS, counts_sql=counts_sql)}
SELECT source, n_tokens AS quality_tokens, capacity, allocation,
       CASE WHEN n_tokens > 0 THEN round(allocation / n_tokens, 6)
            ELSE 0.0 END AS epochs,
       round(allocation / {_CCW_BUDGET}, 6) AS weight
FROM alloc ORDER BY source
"""


ORACLE_COMPOSITE_WEIGHTS = _composite_oracle()


# ---------------------------------------------------------------------------
# Audio near-dup via amplitude-invariant fingerprints: per-window
# zero-crossing counts are exact integers and invariant under positive
# volume scaling (every sample's sign class is preserved), so 3
# consecutive windows' zc values pack into one integer fingerprint and
# near-dup is a position-aligned equi-join — never all-pairs over
# clips, with the LSH-style max-bucket guard. The fixture plants
# floor(3*s/4)-scaled copies; the oracle rebuilds BOTH the original
# and the scaled PCM from md5 hex and replays windows -> zc -> packing
# -> bucket guard -> join.

WAVD_N = 48
_AND_WINDOW_MS = 4      # 32 samples at 8 kHz -> 4 md5 blocks/window
_AND_MIN_MATCHED = 4
_AND_MAX_BUCKET = 200


def q_audio_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode -> per-window zc -> volume-invariant
    fingerprints -> banded near-dup pairs."""
    from hummingbird_spark.operators.multimodal import (
        audio_near_duplicates,
        synth_wav_dups,
        wav_window_features,
    )

    w = wav_window_features(synth_wav_dups(spark, WAVD_N),
                            window_ms=_AND_WINDOW_MS)
    return audio_near_duplicates(
        w, min_matched=_AND_MIN_MATCHED,
        max_bucket_size=_AND_MAX_BUCKET)


ORACLE_AUDIO_NEAR_DUPS = f"""
WITH sized AS (
  SELECT mid, src, 32 + (src % 3) * 16 AS n_blocks
  FROM (
    SELECT mid, CASE WHEN mid % 4 = 1 THEN mid - 1 ELSE mid END AS src
    FROM range({WAVD_N}) t(mid))
), blocks AS (
  SELECT mid, j, CAST(j // 4 AS INT) AS wi, mid % 4 = 1 AS scaled,
         md5('wav|' || src || '|' || j) AS hx
  FROM sized, range(64) r(j) WHERE j < n_blocks
), bsamp AS (
  SELECT mid, wi, j,
    list_transform(
      list_transform(
        list_transform(range(0, 8), i ->
          {_b("4*i + 1")} + 256 * {_b("4*i + 3")}),
        u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END),
      -- the planted copies scale by floor(3*s/4): 3*s is exact in
      -- DOUBLE and /4.0 is a power-of-two divide, so floor() equals
      -- Python's integer floor-div bit-for-bit
      v -> CASE WHEN scaled THEN CAST(floor(3 * v / 4.0) AS BIGINT)
                ELSE v END) AS s
  FROM blocks
), wins AS (
  SELECT mid, wi, flatten(list(s ORDER BY j)) AS sw
  FROM bsamp GROUP BY mid, wi
), zc AS (
  SELECT mid, wi,
    list_sum(list_transform(range(1, 32), i ->
      CASE WHEN (sw[i] < 0) != (sw[i+1] < 0) THEN 1 ELSE 0 END)) AS z
  FROM wins
), fp AS (
  SELECT x.mid, x.wi AS fp_idx,
         CAST(x.z * 65536 + y.z * 256 + w.z AS BIGINT) AS fp
  FROM zc x
  JOIN zc y ON x.mid = y.mid AND y.wi = x.wi + 1
  JOIN zc w ON x.mid = w.mid AND w.wi = x.wi + 2
), kept AS (
  SELECT fp_idx, fp FROM fp GROUP BY fp_idx, fp
  HAVING COUNT(*) <= {_AND_MAX_BUCKET}
), kf AS (
  SELECT f.mid, f.fp_idx, f.fp FROM fp f JOIN kept USING (fp_idx, fp)
)
SELECT x.mid AS a, y.mid AS b, COUNT(*) AS matched_fps
FROM kf x
JOIN kf y ON x.fp_idx = y.fp_idx AND x.fp = y.fp AND x.mid < y.mid
GROUP BY x.mid, y.mid
HAVING COUNT(*) >= {_AND_MIN_MATCHED}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Offset-tolerant audio alignment: the time-axis sibling of
# video_aligned_dups. The fixture prepends 2 fresh windows before each
# volume-scaled copy, so the position-rigid audio_near_dups misses
# every planted pair BY CONSTRUCTION and only the fp-value join + the
# shared offset-mode/run analytics recovers them (at offset 2, full
# consecutive run). One analytics core, two modalities — the oracle
# replays the prefix+scaled PCM rebuild and the alignment SQL.

_AAL_PREFIX_BLOCKS = 8   # 2 windows at window_ms=4
_AAL_MIN_MATCHED = 4
_AAL_MIN_RUN = 3


def q_audio_aligned_dups(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Shifted WAV copies -> fp-value join -> offset mode + longest
    consecutive run."""
    from hummingbird_spark.operators.multimodal import (
        audio_alignment,
        synth_wav_shifted,
        wav_window_features,
    )

    w = wav_window_features(synth_wav_shifted(spark, WAVD_N),
                            window_ms=_AND_WINDOW_MS)
    return audio_alignment(
        w, min_matched=_AAL_MIN_MATCHED, min_aligned_run=_AAL_MIN_RUN,
        max_bucket_size=_AND_MAX_BUCKET)


ORACLE_AUDIO_ALIGNED = f"""
WITH sized AS (
  SELECT mid,
    CASE WHEN mid % 4 = 1
         THEN {_AAL_PREFIX_BLOCKS} + 32 + ((mid - 1) % 3) * 16
         ELSE 32 + (mid % 3) * 16 END AS n_blocks
  FROM range({WAVD_N}) t(mid)
), blocks AS (
  SELECT mid, j, CAST(j // 4 AS INT) AS wi,
         mid % 4 = 1 AND j >= {_AAL_PREFIX_BLOCKS} AS scaled,
         CASE WHEN mid % 4 = 1 AND j >= {_AAL_PREFIX_BLOCKS}
              THEN md5('wav|' || (mid - 1) || '|'
                       || (j - {_AAL_PREFIX_BLOCKS}))
              ELSE md5('wav|' || mid || '|' || j) END AS hx
  FROM sized, range(72) r(j) WHERE j < n_blocks
), bsamp AS (
  SELECT mid, wi, j,
    list_transform(
      list_transform(
        list_transform(range(0, 8), i ->
          {_b("4*i + 1")} + 256 * {_b("4*i + 3")}),
        u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END),
      v -> CASE WHEN scaled THEN CAST(floor(3 * v / 4.0) AS BIGINT)
                ELSE v END) AS s
  FROM blocks
), wins AS (
  SELECT mid, wi, flatten(list(s ORDER BY j)) AS sw
  FROM bsamp GROUP BY mid, wi
), zc AS (
  SELECT mid, wi,
    list_sum(list_transform(range(1, 32), i ->
      CASE WHEN (sw[i] < 0) != (sw[i+1] < 0) THEN 1 ELSE 0 END)) AS z
  FROM wins
), fp AS (
  SELECT x.mid, x.wi AS fp_idx,
         CAST(x.z * 65536 + y.z * 256 + w.z AS BIGINT) AS fp
  FROM zc x
  JOIN zc y ON x.mid = y.mid AND y.wi = x.wi + 1
  JOIN zc w ON x.mid = w.mid AND w.wi = x.wi + 2
), kept AS (
  SELECT fp FROM fp GROUP BY fp
  HAVING COUNT(*) <= {_AND_MAX_BUCKET}
), kf AS (
  SELECT f.mid, f.fp_idx, f.fp FROM fp f JOIN kept USING (fp)
), m AS (
  SELECT x.mid AS a, y.mid AS b, x.fp_idx AS fa, y.fp_idx AS fb,
         y.fp_idx - x.fp_idx AS off
  FROM kf x JOIN kf y ON x.fp = y.fp AND x.mid < y.mid
), cnt AS (
  SELECT a, b, COUNT(*) AS matched_fps FROM m GROUP BY a, b
), md AS (
  SELECT a, b, off AS offset_mode, c AS aligned_fps FROM (
    SELECT a, b, off, COUNT(*) AS c,
      row_number() OVER (PARTITION BY a, b
                         ORDER BY COUNT(*) DESC, off ASC) AS rn
    FROM m GROUP BY a, b, off) WHERE rn = 1
), runs AS (
  SELECT a, b, MAX(rl) AS longest_run FROM (
    SELECT a, b, isl, COUNT(*) AS rl FROM (
      SELECT m.a, m.b, m.fa,
        m.fa - row_number() OVER (PARTITION BY m.a, m.b
                                  ORDER BY m.fa) AS isl
      FROM m JOIN md
        ON m.a = md.a AND m.b = md.b AND m.off = md.offset_mode)
    GROUP BY a, b, isl)
  GROUP BY a, b
)
SELECT c.a, c.b, c.matched_fps, md.offset_mode, md.aligned_fps,
       r.longest_run, r.longest_run >= {_AAL_MIN_RUN} AS aligned
FROM cnt c
JOIN md ON c.a = md.a AND c.b = md.b
JOIN runs r ON c.a = r.a AND c.b = r.b
WHERE c.matched_fps >= {_AAL_MIN_MATCHED}
ORDER BY c.a, c.b
"""


R8_QUERIES: dict[str, tuple] = {
    "video_aligned_dups": (
        q_video_aligned_dups, ORACLE_VIDEO_ALIGNED,
        "temporal alignment for video near-dup: offset mode + longest "
        "consecutive run (shuffled-frames copies score unaligned)"),
    "curation_composite_weights": (
        q_curation_composite_weights, ORACLE_COMPOSITE_WEIGHTS,
        "quality-weighted mixture: PageRank x classifier x perplexity "
        "band -> integer doc mass -> UniMax weights (three unrolled "
        "chains over shared CTE prefixes)"),
    "audio_near_dups": (
        q_audio_near_dups, ORACLE_AUDIO_NEAR_DUPS,
        "audio near-dup via amplitude-invariant zc fingerprints over "
        "real WAV decode (full SQL PCM + scaling replica)"),
    "audio_aligned_dups": (
        q_audio_aligned_dups, ORACLE_AUDIO_ALIGNED,
        "offset-tolerant audio alignment: time-shifted scaled copies "
        "recovered via the shared offset-mode/run analytics core"),
}
