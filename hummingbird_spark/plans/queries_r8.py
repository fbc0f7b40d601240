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

from hummingbird_spark.sources.tables import load_table

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


R8_QUERIES: dict[str, tuple] = {
    "video_aligned_dups": (
        q_video_aligned_dups, ORACLE_VIDEO_ALIGNED,
        "temporal alignment for video near-dup: offset mode + longest "
        "consecutive run (shuffled-frames copies score unaligned)"),
}
