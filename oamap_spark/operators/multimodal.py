"""Multimodal (image/audio/video) column operators.

Convention for media at 100 TB: one row per asset, an opaque
``payload binary`` column next to a typed ``media`` metadata struct
(kind, mime, width/height, duration_ms). All *metadata* operations are
native Column expressions (prunable — a scan that touches only
metadata never reads the payload bytes, which parquet stores as its
own column chunk). *Decode/feature* operations are Arrow-batched
``mapInPandas`` passes whose batch shape, schema, and partitioning are
real; the pixel/sample decode itself is STUBBED — the container has no
image/audio codecs — behind a deterministic byte-level fake
(documented per function) or ``NotImplementedError`` for true codec
paths. Swap `_decode_*_stub` for PIL/ffmpeg in production; every
schema and plan stays identical.

Design rule mirrored from oamap's lazy column fetch (oamap/generator.py
— arrays load on first touch [H]): metadata-only queries must show a
parquet ``ReadSchema`` without the payload column; tests assert this.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")
MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def media_metadata(doc_id: Column, n_chars: Column) -> Column:
    """Deterministic typed metadata derived from document identity —
    the testbed stand-in for real asset metadata. Portable: the DuckDB
    oracle replays the same arithmetic."""
    kind_idx = (doc_id % 3).cast("int")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), kind_idx + 1)
    mime = F.element_at(F.array(*[F.lit(MIME[k]) for k in KINDS]), kind_idx + 1)
    is_image = kind_idx == 0
    return F.struct(
        kind.alias("kind"),
        mime.alias("mime"),
        F.when(is_image, (64 + (doc_id % 8) * 16).cast("int")).alias("width"),
        F.when(is_image, (64 + (doc_id % 5) * 32).cast("int")).alias("height"),
        F.when(~is_image, (n_chars * 10).cast("long")).alias("duration_ms"),
    )


def with_media_columns(docs: DataFrame) -> DataFrame:
    """documents → media table: payload = UTF-8 bytes of text (the
    deterministic fake asset), media = typed metadata struct."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_metadata(F.col("doc_id"), F.col("n_chars")).alias("media"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract — Arrow-batched mapInPandas.
# ---------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _decode_payload_stub(payload: bytes) -> tuple[float, float, list[float]]:
    """STUB decoder (no codecs in this container): deterministic
    byte-level statistics + an 8-dim folded-histogram 'feature'.
    A real deployment replaces this body with PIL/torchaudio/ffmpeg;
    the mapInPandas plumbing, schema, and batching stay unchanged."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0, [0.0] * FEATURE_DIM
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts / arr.size
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    feat = counts.reshape(FEATURE_DIM, 256 // FEATURE_DIM).sum(axis=1)
    feat = (feat / arr.size).astype(np.float32)
    return float(arr.mean()), entropy, feat.tolist()


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over media payloads via Arrow-batched
    ``mapInPandas``. Narrow (no shuffle); each task decodes its own
    partition's batches. Output drops the payload — downstream stages
    carry the small feature vector, never the bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload → empty bytes, the same convention as the
            # mapInArrow twin (decode_features_arrow): zero-stats, not
            # a task-killing TypeError
            payloads = pdf["payload"].map(lambda p: b"" if p is None else p)
            rows = [_decode_payload_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "byte_mean": [r[0] for r in rows],
                    "byte_entropy": [r[1] for r in rows],
                    "feature": [r[2] for r in rows],
                }
            )

    slim = df.select("asset_id", F.col("media.kind").alias("kind"), "payload")
    return slim.mapInPandas(run, DECODE_SCHEMA)


def decode_features_arrow(df: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`decode_features`: the same stub
    decode, but consuming/producing Arrow RecordBatches directly — no
    Arrow→pandas→Arrow conversion per batch. For binary-heavy columns
    that conversion is a full extra copy of every payload (pandas
    materializes each cell as a Python ``bytes`` object), so the Arrow
    path is the one a 100 TB media pipeline would run; equality with
    the pandas path is pinned in tests/test_multimodal.py."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            payloads = batch.column("payload")
            rows = [
                _decode_payload_stub(p.as_py() if p.is_valid else b"")
                for p in payloads
            ]
            n_bytes = pa.array(
                [len(p.as_py()) if p.is_valid else 0 for p in payloads],
                type=pa.int32(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("asset_id"),
                    batch.column("kind"),
                    n_bytes,
                    pa.array([r[0] for r in rows], type=pa.float64()),
                    pa.array([r[1] for r in rows], type=pa.float64()),
                    pa.array([r[2] for r in rows], type=pa.list_(pa.float32())),
                ],
                names=[
                    "asset_id",
                    "kind",
                    "n_bytes",
                    "byte_mean",
                    "byte_entropy",
                    "feature",
                ],
            )

    slim = df.select("asset_id", F.col("media.kind").alias("kind"), "payload")
    return slim.mapInArrow(run, DECODE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass: metadata update is native (width/height withField);
    the pixel resample itself is the stubbed decode path. Real codec
    work would replace the payload in the same mapInPandas slot as
    ``decode_features``; here the payload passes through untouched."""
    resized = (
        F.col("media")
        .withField("width", F.lit(width).cast("int"))
        .withField("height", F.lit(height).cast("int"))
    )
    return df.withColumn(
        "media",
        F.when(F.col("media.kind") == "image", resized).otherwise(F.col("media")),
    )


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("win_bytes", T.LongType()),
        T.StructField("energy", T.DoubleType()),
    ]
)


def audio_window_energy(df: DataFrame, window_bytes: int = 256) -> DataFrame:
    """Windowed energy over audio payloads — the fixed-frame analysis
    pass of an audio curation pipeline (silence trimming, loudness
    filtering, VAD pre-gates all start here). The payload is cut into
    ``window_bytes`` frames and each frame's RMS over byte values is
    emitted; with a real PCM decoder the byte array becomes the sample
    array in the same mapInPandas slot (the stub convention of
    ``decode_features``). One row per (asset, window): exploded
    scalars, narrow, no shuffle — each task processes its own
    partition's payloads and downstream carries only the tiny frame
    table, never the bytes.

    Exactness (what lets the DuckDB oracle replay this): per-frame
    sum of squared bytes is an integer ≤ 255²·window_bytes, exactly
    representable in float64, so sqrt(sum/n) is bit-identical on any
    engine; emitted via the repo's floor(x·10⁴ + 0.5)/10⁴ idiom on
    BOTH sides — Python round() is half-even on exact binary and
    diverges from SQL round at decimal half-boundaries
    (analytics_extra.py incident)."""
    import numpy as np

    if window_bytes < 1:
        raise ValueError("audio_window_energy: window_bytes must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, sizes, energies = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = b"" if payload is None else payload
                arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
                if arr.size == 0:
                    continue
                # all per-frame squared sums in one vectorized reduceat
                # (interpreter-per-frame loops would dominate the Arrow
                # hot path at real payload sizes)
                starts = np.arange(0, arr.size, window_bytes)
                ssq = np.add.reduceat(arr * arr, starts)
                lens = np.diff(np.append(starts, arr.size))
                rms = np.sqrt(ssq / lens)
                e = np.floor(rms * 1e4 + 0.5) / 1e4
                ids.extend([aid] * starts.size)
                wins.extend(range(starts.size))
                sizes.extend(lens.tolist())
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(wins, dtype="int64"),
                    "win_bytes": pd.Series(sizes, dtype="int64"),
                    "energy": pd.Series(energies, dtype="float64"),
                }
            )

    slim = df.where(F.col("media.kind") == "audio").select("asset_id", "payload")
    return slim.mapInPandas(run, ENERGY_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int) -> DataFrame:
    """Sample frame timestamps every ``every_ms`` from video assets:
    pure metadata math (sequence + explode), no payload read — the
    ReadSchema must not contain `payload`. Each output row is one
    frame reference (asset_id, frame_no, t_ms); the actual frame
    decode would join back to payload via the stub path."""
    frames = df.where(F.col("media.kind") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("media.duration_ms"), F.lit(every_ms))
        ).alias("t_ms"),
    )
    return frames.withColumn(
        "frame_no", ((F.col("t_ms") / every_ms)).cast("long")
    ).select("asset_id", "frame_no", "t_ms")
