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


R7_QUERIES: dict[str, tuple] = {
    "wav_dsp_features": (q_wav_dsp_features, ORACLE_WAV_DSP,
                         "real RIFF/WAVE PCM16 decode + per-window "
                         "integer-exact DSP (full SQL PCM replica)"),
}
