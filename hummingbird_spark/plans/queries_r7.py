"""Round-7 registry queries.

  wav_dsp_features — the first REAL codec decode in the tree: genuine
      RIFF/WAVE PCM16 containers (stdlib wave encoder) decoded with
      the stdlib wave module in an Arrow kernel, per-window DSP (rms /
      zero crossings / peak) computed on the actual int16 samples.
      Fully oracle-provable because the fixture's PCM stream derives
      from md5 blocks (DuckDB rebuilds the exact samples via hex-digit
      arithmetic) and the window features are integer-exact up to one
      IEEE divide + sqrt. Replaces the r6 "guarded stub" depth item
      for audio; the image/video codec guards keep their actionable
      errors (no PIL/opencv in the container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbird_spark.sources.tables import load_table

# tokens(text) in DuckDB — the idiom every text oracle pins
_TOKS = (r"CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] "
         r"ELSE string_split_regex(trim(text), '\s+') END")

WAV_N = 48
_HEXPOS = "strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1"


def q_wav_dsp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode -> per-window integer-exact DSP rows.
    48 clips x {2,3,4} windows of 128 samples at 8 kHz / 16 ms."""
    from hummingbird_spark.operators.multimodal import (
        synth_wav,
        wav_window_features,
    )

    media = synth_wav(spark, WAV_N)
    w = wav_window_features(media, window_ms=16)
    return (
        w.select(
            "media_id", "window_idx", "start_ms",
            F.round("rms", 6).alias("rms"),
            "zero_crossings", "peak",
        )
        .orderBy("media_id", "window_idx")
    )


def _b(i4: str) -> str:
    """SQL for one digest byte at hex position expression i4 (1-based)."""
    hi = _HEXPOS.format(p=i4)
    lo = _HEXPOS.format(p=f"{i4} + 1")
    return f"(({hi}) * 16 + ({lo}))"


# PCM replica: block j of clip mid is md5('wav|mid|j'); digest byte k
# lives at hex chars (2k+1, 2k+2); sample i is little-endian int16
# from bytes (2i, 2i+1). Window = 16 blocks = 128 samples; divisor
# 137438953472 = 128 * 32768^2 (integer ssq -> one exact IEEE divide
# + sqrt, bit-identical to the numpy kernel).
ORACLE_WAV_DSP = f"""
WITH clips AS (
  SELECT mid, 32 + (mid % 3) * 16 AS n_blocks
  FROM range({WAV_N}) t(mid)
), blocks AS (
  SELECT mid, j, CAST(j // 16 AS INT) AS wi,
         md5('wav|' || mid || '|' || j) AS hx
  FROM clips, range(64) r(j) WHERE j < n_blocks
), bsamp AS (
  SELECT mid, wi, j,
    list_transform(
      list_transform(range(0, 8), i ->
        {_b("4*i + 1")} + 256 * {_b("4*i + 3")}),
      u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS s
  FROM blocks
), wins AS (
  SELECT mid, wi, flatten(list(s ORDER BY j)) AS sw
  FROM bsamp GROUP BY mid, wi
)
SELECT mid AS media_id, wi AS window_idx,
  CAST(wi * 16 AS INT) AS start_ms,
  ROUND(sqrt(list_sum(list_transform(sw, x -> CAST(x AS BIGINT) * x))
        / 137438953472.0), 6) AS rms,
  CAST(list_sum(list_transform(range(1, 128), i ->
    CASE WHEN (sw[i] < 0) != (sw[i+1] < 0) THEN 1 ELSE 0 END)) AS INT)
    AS zero_crossings,
  CAST(list_max(list_transform(sw, x -> abs(x))) AS INT) AS peak
FROM wins
ORDER BY media_id, window_idx
"""


# ---------------------------------------------------------------------------
# Graph operators over the rare-shingle link graph (operators/graph.py):
# integer-trajectory PageRank and deterministic label propagation, both
# with full unrolled-CTE oracles (the classifier/k-means discipline
# applied to graph iteration).

_PR_ROUNDS = 4
_LP_ROUNDS = 3
_PR_SCALE = 1_000_000
_PR_DAMP = 85

# shared graph CTEs: distinct per-doc lowercased word trigrams ->
# df-capped rare set -> undirected edge list -> symmetric + degrees
_GRAPH_CTES = rf"""ws AS (
  SELECT doc_id, list_transform({_TOKS}, w -> lower(w)) AS ws
  FROM documents
),
tg AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))
             AS g
    FROM ws WHERE len(ws) >= 3)
),
rare AS (
  SELECT g FROM tg GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 5
),
e AS (
  SELECT DISTINCT ta.doc_id AS a, tb.doc_id AS b
  FROM tg ta JOIN rare USING (g) JOIN tg tb USING (g)
  WHERE ta.doc_id < tb.doc_id
),
sym AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b AS src, a AS dst FROM e
),
deg AS (
  SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src
)"""


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-trigram link graph -> 4 rounds of scaled-integer PageRank.
    rank_scaled is an exact int64, so the whole trajectory
    hash-compares against the unrolled SQL replay."""
    from hummingbird_spark.operators.graph import (
        pagerank_scaled,
        rare_trigram_edges,
    )

    d = load_table(spark, sf_dir, "documents")
    pr = pagerank_scaled(rare_trigram_edges(d), rounds=_PR_ROUNDS,
                         damping_pct=_PR_DAMP, scale=_PR_SCALE)
    return pr.select(
        F.col("node").alias("doc_id"),
        F.col("deg").alias("degree"),
        "rank_scaled",
    ).orderBy("doc_id")


def _pagerank_oracle() -> str:
    base = _PR_SCALE * (100 - _PR_DAMP) // 100
    ctes = [_GRAPH_CTES,
            f"r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r "
            f"FROM deg)"]
    for t in range(1, _PR_ROUNDS + 1):
        ctes.append(
            f"r{t} AS (\n"
            f"  SELECT s.dst AS node,\n"
            f"    CAST({base} + SUM(({_PR_DAMP} * r.r) // (100 * d.deg))"
            f" AS BIGINT) AS r\n"
            f"  FROM sym s JOIN r{t-1} r ON s.src = r.node\n"
            f"  JOIN deg d ON s.src = d.node\n"
            f"  GROUP BY s.dst)")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT r.node AS doc_id, d.deg AS degree, r.r AS rank_scaled
FROM r{_PR_ROUNDS} r JOIN deg d ON r.node = d.node
ORDER BY doc_id
""")


ORACLE_LINK_PAGERANK = _pagerank_oracle()


def q_link_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label propagation (3 rounds, mode label with
    count-desc/label-asc tie-break) -> per-doc community + size."""
    from hummingbird_spark.operators.graph import (
        label_propagation,
        rare_trigram_edges,
    )

    d = load_table(spark, sf_dir, "documents")
    lp = label_propagation(rare_trigram_edges(d), rounds=_LP_ROUNDS)
    return lp.select(
        F.col("node").alias("doc_id"),
        "community",
        F.count(F.lit(1)).over(Window.partitionBy("community"))
        .alias("csize"),
    ).orderBy("doc_id")


def _lp_oracle() -> str:
    ctes = [_GRAPH_CTES,
            "l0 AS (SELECT DISTINCT src AS node, src AS lab FROM sym)"]
    for t in range(1, _LP_ROUNDS + 1):
        ctes.append(
            f"v{t} AS (\n"
            f"  SELECT s.src AS node, l.lab, COUNT(*) AS c\n"
            f"  FROM sym s JOIN l{t-1} l ON s.dst = l.node\n"
            f"  GROUP BY s.src, l.lab),\n"
            f"l{t} AS (\n"
            f"  SELECT node, lab FROM (\n"
            f"    SELECT node, lab, row_number() OVER\n"
            f"      (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn\n"
            f"    FROM v{t}) WHERE rn = 1)")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT node AS doc_id, lab AS community,
       COUNT(*) OVER (PARTITION BY lab) AS csize
FROM l{_LP_ROUNDS}
ORDER BY doc_id
""")


ORACLE_LINK_COMMUNITIES = _lp_oracle()


# ---------------------------------------------------------------------------
# Perceptual image near-dup: integer-DCT pHash + banded Hamming join.
# The oracle rebuilds the pixels from md5 hex digits, replays the
# fixed-point DCT with the SAME embedded integer matrix, packs the
# median-threshold bits via literal HUGEINT powers (the simhash-oracle
# idiom), and all-pairs-verifies Hamming <= 6 (N=60 -> 1770 pairs; the
# Spark side uses the banded join, identical by the pigeonhole bound).

IMG_N = 60
_PHASH_MAX_HAMMING = 6


def q_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hummingbird_spark.operators.multimodal import (
        image_phash,
        phash_near_duplicate_pairs,
        synth_images,
    )

    hashed = image_phash(synth_images(spark, IMG_N))
    return phash_near_duplicate_pairs(
        hashed, max_hamming=_PHASH_MAX_HAMMING)


def _phash_oracle() -> str:
    from hummingbird_spark.operators.multimodal import (
        _IMG_PERT_AMP,
        _IMG_PERT_MOD,
        PHASH_DCT16,
    )

    tm = ("[" + ",".join(
        "[" + ",".join(str(v) for v in row) + "]"
        for row in PHASH_DCT16) + "]")
    pw = ("[" + ",".join(str(1 << i) for i in range(64))
          + "]::HUGEINT[]")
    hx = "strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1"
    b0 = f"(({hx.format(p='2*i + 1')}) * 16 + ({hx.format(p='2*i + 2')}))"
    return f"""
WITH ids AS (SELECT mid FROM range({IMG_N}) t(mid)),
base AS (
  SELECT mid, CASE WHEN mid % 4 = 1 THEN mid - 1 ELSE mid END AS src,
         mid % 4 = 1 AS pert FROM ids
),
hexes AS (
  SELECT mid, pert,
         string_agg(md5('img|' || src || '|' || k), '' ORDER BY k) AS hx
  FROM base, range(16) r(k) GROUP BY mid, pert, src
),
px AS (
  SELECT mid, list_transform(range(0, 256), i ->
    ({b0} % {255 - _IMG_PERT_AMP})
    + CASE WHEN pert AND i % {_IMG_PERT_MOD} = 0
           THEN {_IMG_PERT_AMP} ELSE 0 END) AS p
  FROM hexes
),
dct AS (
  SELECT mid, flatten(list_transform(range(0, 8), u ->
    list_transform(range(0, 8), v ->
      list_sum(list_transform(range(0, 16), y ->
        list_sum(list_transform(range(0, 16), x ->
          ({tm})[u+1][x+1] * p[x*16 + y + 1]))
        * ({tm})[v+1][y+1]))))) AS a
  FROM px
),
med AS (
  SELECT mid, a, list_sort(a) AS s FROM dct
),
hashes AS (
  SELECT mid,
    CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
         THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
      AS phash
  FROM (
    SELECT mid, list_sum(list_transform(range(0, 64), i ->
      CASE WHEN 2 * a[i+1] > s[32] + s[33]
           THEN ({pw})[i+1] ELSE 0::HUGEINT END)) AS h
    FROM med)
)
SELECT x.mid AS a, y.mid AS b,
       bit_count(xor(x.phash, y.phash)) AS hamming
FROM hashes x JOIN hashes y ON x.mid < y.mid
WHERE bit_count(xor(x.phash, y.phash)) <= {_PHASH_MAX_HAMMING}
ORDER BY a, b
"""


ORACLE_PHASH_NEAR_DUPS = _phash_oracle()


def q_phash_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image dedup pipeline's last step (the SemDeDup shape on the
    image modality): pHash near-dup pairs -> connected components ->
    per-image cluster membership + size. Joins the perceptual-hash
    path into the same min-label clustering every other near-dup
    family (MinHash, SimHash, embedding) feeds."""
    from hummingbird_spark.operators.dedup import connected_components
    from hummingbird_spark.operators.multimodal import (
        image_phash,
        phash_near_duplicate_pairs,
        synth_images,
    )

    pairs = phash_near_duplicate_pairs(
        image_phash(synth_images(spark, IMG_N)),
        max_hamming=_PHASH_MAX_HAMMING)
    labels = connected_components(pairs.select("a", "b"))
    return (
        labels.select(
            F.col("node").alias("media_id"),
            F.col("label").alias("cluster_id"),
            F.count(F.lit(1))
            .over(Window.partitionBy("label")).alias("cluster_size"),
        )
        .orderBy("media_id")
    )


ORACLE_PHASH_CLUSTERS = f"""
WITH RECURSIVE hashes AS (
  SELECT a, b FROM ({ORACLE_PHASH_NEAR_DUPS.strip()}) t
),
edges AS (SELECT a, b FROM hashes UNION SELECT b, a FROM hashes),
reach(node, root) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node)
SELECT node AS media_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp ORDER BY media_id
"""


def q_link_pagerank_weighted(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Weighted PageRank: edge strength = number of shared rare
    trigrams, propagated via the overflow-safe per-unit-share
    quantization (w * floor(damping * r / (100 * W)))."""
    from hummingbird_spark.operators.graph import (
        pagerank_scaled,
        rare_trigram_edges,
    )

    d = load_table(spark, sf_dir, "documents")
    pr = pagerank_scaled(
        rare_trigram_edges(d, weighted=True), rounds=_PR_ROUNDS,
        damping_pct=_PR_DAMP, scale=_PR_SCALE, weight_col="w")
    return pr.select(
        F.col("node").alias("doc_id"),
        F.col("deg").alias("wdegree"),
        "rank_scaled",
    ).orderBy("doc_id")


def _pagerank_weighted_oracle() -> str:
    base = _PR_SCALE * (100 - _PR_DAMP) // 100
    graph_w = _GRAPH_CTES.replace(
        """e AS (
  SELECT DISTINCT ta.doc_id AS a, tb.doc_id AS b
  FROM tg ta JOIN rare USING (g) JOIN tg tb USING (g)
  WHERE ta.doc_id < tb.doc_id
),
sym AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b AS src, a AS dst FROM e
),
deg AS (
  SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src
)""",
        """e AS (
  SELECT ta.doc_id AS a, tb.doc_id AS b, COUNT(*) AS w
  FROM tg ta JOIN rare USING (g) JOIN tg tb USING (g)
  WHERE ta.doc_id < tb.doc_id
  GROUP BY ta.doc_id, tb.doc_id
),
sym AS (
  SELECT a AS src, b AS dst, w FROM e
  UNION ALL SELECT b AS src, a AS dst, w FROM e
),
deg AS (
  SELECT src AS node, SUM(w) AS deg FROM sym GROUP BY src
)""")
    ctes = [graph_w,
            f"r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r "
            f"FROM deg)"]
    for t in range(1, _PR_ROUNDS + 1):
        ctes.append(
            f"r{t} AS (\n"
            f"  SELECT s.dst AS node,\n"
            f"    CAST({base} + SUM(s.w *\n"
            f"      (({_PR_DAMP} * r.r) // (100 * d.deg))) AS BIGINT)"
            f" AS r\n"
            f"  FROM sym s JOIN r{t-1} r ON s.src = r.node\n"
            f"  JOIN deg d ON s.src = d.node\n"
            f"  GROUP BY s.dst)")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT r.node AS doc_id, CAST(d.deg AS BIGINT) AS wdegree,
       r.r AS rank_scaled
FROM r{_PR_ROUNDS} r JOIN deg d ON r.node = d.node
ORDER BY doc_id
""")


ORACLE_LINK_PAGERANK_WEIGHTED = _pagerank_weighted_oracle()


_TR_SOURCES = ("src0", "src3")  # the fixture's 'trusted' seed sources


def q_trustrank_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded personalized PageRank (TrustRank, Gyongyi et al. 2004)
    over the link graph: quality mass propagates from docs of two
    trusted sources instead of uniformly — the seed-propagation
    scoring a curation pipeline uses to weight domains by proximity
    to known-good content. Same exact-integer trajectory as
    link_pagerank; rank_scaled hash-compares against the unrolled
    replay."""
    from hummingbird_spark.operators.graph import (
        pagerank_scaled,
        rare_trigram_edges,
    )

    d = load_table(spark, sf_dir, "documents")
    seeds = d.filter(F.col("source").isin(*_TR_SOURCES)) \
        .select("doc_id")
    pr = pagerank_scaled(rare_trigram_edges(d), rounds=_PR_ROUNDS,
                         damping_pct=_PR_DAMP, scale=_PR_SCALE,
                         seeds=seeds)
    return pr.select(
        F.col("node").alias("doc_id"),
        F.col("deg").alias("degree"),
        "rank_scaled",
    ).orderBy("doc_id")


def _trustrank_oracle() -> str:
    base = _PR_SCALE * (100 - _PR_DAMP) // 100
    srcs = ", ".join(f"'{s}'" for s in _TR_SOURCES)
    ctes = [_GRAPH_CTES,
            f"seeds AS (SELECT doc_id AS node FROM documents "
            f"WHERE source IN ({srcs}))",
            f"bases AS (\n"
            f"  SELECT d.node,\n"
            f"    CASE WHEN sd.node IS NOT NULL THEN {base}\n"
            f"         ELSE 0 END AS bs\n"
            f"  FROM deg d LEFT JOIN seeds sd USING (node))",
            f"r0 AS (SELECT node, CAST(CASE WHEN bs > 0 THEN "
            f"{_PR_SCALE} ELSE 0 END AS BIGINT) AS r FROM bases)"]
    for t in range(1, _PR_ROUNDS + 1):
        ctes.append(
            f"r{t} AS (\n"
            f"  SELECT b.node,\n"
            f"    CAST(b.bs + COALESCE(i.inmass, 0) AS BIGINT) AS r\n"
            f"  FROM bases b LEFT JOIN (\n"
            f"    SELECT s.dst AS node,\n"
            f"      SUM(({_PR_DAMP} * r.r) // (100 * d.deg)) AS inmass\n"
            f"    FROM sym s JOIN r{t-1} r ON s.src = r.node\n"
            f"    JOIN deg d ON s.src = d.node\n"
            f"    GROUP BY s.dst) i USING (node))")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT r.node AS doc_id, d.deg AS degree, r.r AS rank_scaled
FROM r{_PR_ROUNDS} r JOIN deg d ON r.node = d.node
ORDER BY doc_id
""")


ORACLE_TRUSTRANK = _trustrank_oracle()


def q_link_canonical_docs(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Cross-operator composition (the unimax_packed_pipeline shape on
    the graph family): label-propagation communities JOIN PageRank
    mass -> per multi-doc community keep the highest-ranked member
    (tie-break smallest id) — canonical-representative selection by
    quality mass, the keep-list a graph-aware dedup pass emits."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql.window import Window as W

    from hummingbird_spark.operators.graph import (
        label_propagation,
        pagerank_scaled,
        rare_trigram_edges,
    )

    d = load_table(spark, sf_dir, "documents")
    # both iterative chains consume the edge list — materialize the
    # trigram self-join ONCE instead of once per chain
    edges = rare_trigram_edges(d).localCheckpoint(eager=True)
    # the two chains are independent until the final join and each
    # blocks the driver per round — build them concurrently so their
    # round jobs overlap on the cluster (same pattern as
    # curation_composite_weights; measured 4.2 -> 3.1 s at sf0.1)
    with ThreadPoolExecutor(max_workers=2) as ex:
        flp = ex.submit(label_propagation, edges, _LP_ROUNDS)
        fpr = ex.submit(pagerank_scaled, edges, _PR_ROUNDS)
        lp, pr = flp.result(), fpr.result()
    joined = lp.join(pr, "node").withColumn(
        "csize", F.count(F.lit(1)).over(W.partitionBy("community")))
    win = W.partitionBy("community").orderBy(
        F.desc("rank_scaled"), F.asc("node"))
    return (
        joined.filter(F.col("csize") >= 2)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(F.col("community"),
                F.col("csize"),
                F.col("node").alias("canonical_doc"),
                "rank_scaled")
        .orderBy("community")
    )


def _canonical_oracle() -> str:
    """Composes the LP and PageRank unrolled chains over ONE shared
    graph CTE prefix."""
    base = _PR_SCALE * (100 - _PR_DAMP) // 100
    ctes = [_GRAPH_CTES,
            f"r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r "
            f"FROM deg)"]
    for t in range(1, _PR_ROUNDS + 1):
        ctes.append(
            f"r{t} AS (\n"
            f"  SELECT s.dst AS node,\n"
            f"    CAST({base} + SUM(({_PR_DAMP} * r.r) // (100 * d.deg))"
            f" AS BIGINT) AS r\n"
            f"  FROM sym s JOIN r{t-1} r ON s.src = r.node\n"
            f"  JOIN deg d ON s.src = d.node\n"
            f"  GROUP BY s.dst)")
    ctes.append("l0 AS (SELECT DISTINCT src AS node, src AS lab "
                "FROM sym)")
    for t in range(1, _LP_ROUNDS + 1):
        ctes.append(
            f"v{t} AS (\n"
            f"  SELECT s.src AS node, l.lab, COUNT(*) AS c\n"
            f"  FROM sym s JOIN l{t-1} l ON s.dst = l.node\n"
            f"  GROUP BY s.src, l.lab),\n"
            f"l{t} AS (\n"
            f"  SELECT node, lab FROM (\n"
            f"    SELECT node, lab, row_number() OVER\n"
            f"      (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn\n"
            f"    FROM v{t}) WHERE rn = 1)")
    ctes.append(f"""joined AS (
  SELECT l.node, l.lab AS community, r.r AS rank_scaled,
         COUNT(*) OVER (PARTITION BY l.lab) AS csize
  FROM l{_LP_ROUNDS} l JOIN r{_PR_ROUNDS} r ON l.node = r.node)""")
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT community, csize, node AS canonical_doc, rank_scaled
FROM (
  SELECT *, row_number() OVER
    (PARTITION BY community
     ORDER BY rank_scaled DESC, node ASC) AS rn
  FROM joined WHERE csize >= 2)
WHERE rn = 1
ORDER BY community
""")


ORACLE_LINK_CANONICAL = _canonical_oracle()


VID_N = 24
_VID_MIN_MATCHED = 4


def q_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level video near-dup: decode frames -> integer-DCT pHash
    per frame -> banded Hamming join at frame grain -> video pairs
    with >= 4 matched frame pairs."""
    from hummingbird_spark.operators.multimodal import (
        synth_videos,
        video_frame_hashes,
        video_near_duplicates,
    )

    fh = video_frame_hashes(synth_videos(spark, VID_N))
    return video_near_duplicates(
        fh, max_hamming=_PHASH_MAX_HAMMING,
        min_matched_frames=_VID_MIN_MATCHED)


def _video_oracle() -> str:
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
base AS (
  SELECT mid, CASE WHEN mid % 4 = 1 THEN mid - 1 ELSE mid END AS src,
         mid % 4 = 1 AS pert FROM ids
),
hexes AS (
  SELECT mid, pert, f,
         string_agg(md5('vid|' || src || '|' || f || '|' || k),
                    '' ORDER BY k) AS hx
  FROM base, range({VID_FRAMES}) fr(f), range(16) r(k)
  GROUP BY mid, pert, src, f
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
  SELECT x.mid AS a, y.mid AS b
  FROM hashes x JOIN hashes y ON x.mid < y.mid
  WHERE bit_count(xor(x.phash, y.phash)) <= {_PHASH_MAX_HAMMING}
)
SELECT a, b, COUNT(*) AS matched_frames
FROM matched GROUP BY a, b
HAVING COUNT(*) >= {_VID_MIN_MATCHED}
ORDER BY a, b
"""


ORACLE_VIDEO_NEAR_DUPS = _video_oracle()


R7_QUERIES: dict[str, tuple] = {
    "wav_dsp_features": (q_wav_dsp_features, ORACLE_WAV_DSP,
                         "real RIFF/WAVE PCM16 decode + per-window "
                         "integer-exact DSP (full SQL PCM replica)"),
    "link_pagerank": (q_link_pagerank, ORACLE_LINK_PAGERANK,
                      "scaled-integer PageRank over the rare-trigram "
                      "link graph (unrolled-CTE oracle)"),
    "link_communities": (q_link_communities, ORACLE_LINK_COMMUNITIES,
                         "deterministic label propagation communities "
                         "(unrolled-CTE oracle)"),
    "phash_near_dups": (q_phash_near_dups, ORACLE_PHASH_NEAR_DUPS,
                        "integer-DCT perceptual-hash image near-dup "
                        "pairs via banded Hamming join (full SQL "
                        "pixel+DCT replica)"),
    "phash_dup_clusters": (q_phash_dup_clusters, ORACLE_PHASH_CLUSTERS,
                           "image dup clusters: pHash pairs -> "
                           "connected components (recursive-CTE "
                           "oracle)"),
    "video_near_dups": (q_video_near_dups, ORACLE_VIDEO_NEAR_DUPS,
                        "frame-level video near-dup via per-frame "
                        "integer-DCT pHash (full SQL replica)"),
    "trustrank_scores": (q_trustrank_scores, ORACLE_TRUSTRANK,
                         "seeded personalized PageRank (TrustRank) "
                         "over the link graph (unrolled-CTE oracle)"),
    "link_pagerank_weighted": (
        q_link_pagerank_weighted, ORACLE_LINK_PAGERANK_WEIGHTED,
        "weighted PageRank over shared-shingle-count edges "
        "(overflow-safe per-unit-share quantization)"),
    "link_canonical_docs": (
        q_link_canonical_docs, ORACLE_LINK_CANONICAL,
        "canonical doc per community by PageRank mass (LP x PageRank "
        "composition, shared-prefix unrolled oracle)"),
}
