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


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth media -> Arrow-batched decode -> per-kind feature stats.
    UDF-backed (the one deliberate mapInPandas path) -> rows-only."""
    feats = decode_media(synth_media(spark, 120))
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
    per clip (deterministic surrogate DSP; Arrow 1->N batch shape) ->
    rows-only."""
    from hummingbird_spark.operators.multimodal import (
        audio_window_features,
    )

    media = synth_media(spark, 120)
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


GEN_QUERIES: dict[str, tuple] = {
    "docgen_all_types": (q_docgen, ORACLE_DOCGEN,
                         "G1 DocGen arithmetic parity"),
    "media_pipeline": (q_media_pipeline, None,
                       "multimodal decode+feature pipeline (rows-only)"),
    "audio_windows": (q_audio_windows, None,
                      "per-window audio features rollup (rows-only)"),
}
