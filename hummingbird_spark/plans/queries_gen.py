"""Generator + multimodal queries. The docgen oracle reproduces the
reference's DocGen arithmetic (sim.go:305-333) in pure SQL, proving the
generated fixture is engine-independent; the media pipeline is
UDF-backed (deterministic stub decode) and rows-only checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbird_spark.operators.generator import docgen
from hummingbird_spark.operators.multimodal import (
    decode_media,
    synth_media,
)

DOCGEN_N = 1000


def q_docgen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scalar columns only; the array column is stringified with to_json
    # because the driver's pandas canonicalizer cannot sort/hash list
    # values (r2 driver-red: "unhashable type: 'list'")
    return docgen(spark, DOCGEN_N).select(
        "_id", "color", "float64", "int64", "seq", "string", "ts",
        F.to_json("array").alias("array_json"),
    )


ORACLE_DOCGEN = f"""
SELECT
  lpad(lower(to_hex(seq)), 16, '0')
    || substr(md5(CAST(seq AS VARCHAR)), 1, 8) AS _id,
  ['Red','Orange','Yellow','Green','Blue','Indigo','Violet'][(seq % 7) + 1]
    AS color,
  CAST((seq + 1001) * (seq + 1001) + 3629 AS DOUBLE) AS float64,
  CAST((seq + 1001) * (seq + 1001) + 3629 AS BIGINT) AS int64,
  CAST(seq AS INT) AS seq,
  lpad(CAST(seq + 1 AS VARCHAR), 6, '0') || '-'
    || CAST((seq + 1001) * (seq + 1001) + 3629 AS VARCHAR) || '-'
    || CAST(seq + 1001 AS VARCHAR) || '-'
    || CAST((seq + 1001) * (seq + 1001) + 3629 AS VARCHAR) AS string,
  TIMESTAMP '1970-01-01' + seq * INTERVAL 1 SECOND AS ts,
  '[' || array_to_string(
    list_transform(range(101, 110), k -> CAST(k * k - k AS INT)), ','
  ) || ']' AS array_json
FROM range({DOCGEN_N}) t(seq)
"""


MEDIA_N = 120


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth media -> Arrow-batched decode -> per-kind feature stats.
    UDF-backed (a deliberate mapInPandas path), yet fully
    oracle-provable: every stage of the surrogate kernel is
    deterministic hash math (HBMM header + md5 filler; feature =
    sha256 over the payload's hex encoding), so ORACLE_MEDIA rebuilds
    the payloads and features in pure SQL — the same replica strategy
    the winnowing oracle uses for its rolling hash."""
    feats = decode_media(synth_media(spark, MEDIA_N))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
            F.sum("byte_len").alias("total_bytes"),
        )
        .orderBy("kind")
    )


def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio time-axis explode: per-window RMS/ZCR features rolled up
    per clip (deterministic surrogate DSP; Arrow 1->N batch shape).
    The surrogate kernel hashes the payload hex and left-folds the
    RMS sum in float64, so ORACLE_AUDIO_WINDOWS replicates it
    bit-for-bit in DuckDB (seed = sha256(hex || '|' || window_idx),
    bytes via hex-digit positions, same (b-127.5)/127.5 sample map)."""
    from hummingbird_spark.operators.multimodal import (
        audio_window_features,
    )

    media = synth_media(spark, MEDIA_N)
    wins = audio_window_features(media, window_ms=100)
    return (
        wins.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.round(F.avg("rms"), 6).alias("avg_rms"),
            F.sum("zero_crossings").alias("total_zc"),
        )
        .orderBy("media_id")
    )


# Both multimodal oracles rebuild the synthetic payloads in SQL:
# payload_hex = 'HBMM' + pack(<BHH kind_idx, w, h) + md5('media|'+mid)*4
# (all lowercase hex; w,h < 80 so each uint16 LE is '%02x' + '00').
# The surrogate digest hashes the HEX encoding precisely so DuckDB's
# sha256(VARCHAR) can replicate it — the raw-BLOB variant would be
# equally deterministic but SQL-opaque. Fixture constants mirrored
# from synth_media: kinds cycle (image,audio,video), duration_ms=1000
# for audio -> 10 windows at window_ms=100.
ORACLE_MEDIA = f"""
WITH p AS (
  SELECT mid,
    ['image','audio','video'][(mid % 3) + 1] AS kind,
    '48424d4d' || printf('%02x', mid % 3)
      || printf('%02x', 16 + mid % 64) || '00'
      || printf('%02x', 16 + (mid * 7) % 64) || '00'
      || repeat(md5('media|' || mid), 4) AS hex
  FROM range({MEDIA_N}) t(mid)
), f AS (
  SELECT kind, CAST(length(hex) / 2 AS INT) AS byte_len,
    CAST(list_sum(list_transform(range(0, 4), i ->
      ((strpos('0123456789abcdef', substr(sha256(hex), 2*i+1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(sha256(hex), 2*i+2, 1)) - 1))
      * (256.0 ** i))) / 4294967296.0 AS REAL) AS f0
  FROM p
)
SELECT kind, COUNT(*) AS n, ROUND(AVG(f0), 6) AS avg_f0,
  CAST(SUM(byte_len) AS BIGINT) AS total_bytes
FROM f GROUP BY kind ORDER BY kind
"""

ORACLE_AUDIO_WINDOWS = f"""
WITH p AS (
  SELECT mid,
    '48424d4d01'
      || printf('%02x', 16 + mid % 64) || '00'
      || printf('%02x', 16 + (mid * 7) % 64) || '00'
      || repeat(md5('media|' || mid), 4) AS hex
  FROM range({MEDIA_N}) t(mid) WHERE mid % 3 = 1
), w AS (
  SELECT mid, wi, sha256(hex || '|' || wi) AS d
  FROM p, range(10) r(wi)
), s AS (
  SELECT mid,
    list_transform(range(0, 32), i ->
      (strpos('0123456789abcdef', substr(d, 2*i+1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(d, 2*i+2, 1)) - 1)) AS bytes
  FROM w
), feat AS (
  SELECT mid,
    CAST(sqrt(list_sum(list_transform(
      bytes, x -> ((x - 127.5) / 127.5) ** 2)) / 32.0) AS REAL) AS rms,
    list_sum(list_transform(range(0, 31), i ->
      CASE WHEN (bytes[i+1] < 127.5) != (bytes[i+2] < 127.5)
           THEN 1 ELSE 0 END)) AS zc
  FROM s
)
SELECT mid AS media_id, COUNT(*) AS n_windows,
  ROUND(AVG(rms), 6) AS avg_rms, CAST(SUM(zc) AS BIGINT) AS total_zc
FROM feat GROUP BY mid ORDER BY media_id
"""

GEN_QUERIES: dict[str, tuple] = {
    "docgen_all_types": (q_docgen, ORACLE_DOCGEN,
                         "G1 DocGen arithmetic parity"),
    "media_pipeline": (q_media_pipeline, ORACLE_MEDIA,
                       "multimodal decode+feature pipeline "
                       "(full SQL payload replica)"),
    "audio_windows": (q_audio_windows, ORACLE_AUDIO_WINDOWS,
                      "per-window audio features rollup "
                      "(full SQL DSP replica)"),
}
