"""Multimodal operator tests: stub-decoder equivalence (the oamap
'two implementations must agree' pattern — Spark mapInPandas vs a
local recompute), metadata-only pruning, and oracle compares."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oamap_spark.operators import multimodal as MM
from oamap_spark.plans import audit
from oamap_spark.plans.verify import compare_query
from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

import __spark_entry__ as entrymod


def test_decode_features_matches_local_recompute(spark):
    """The mapInPandas decode must agree with a driver-local run of the
    same stub over collected payloads (validates Arrow batch plumbing,
    not the stub's arithmetic with itself)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    m = MM.with_media_columns(docs)
    got = {r["asset_id"]: r for r in MM.decode_features(m).collect()}
    for row in m.select("asset_id", "payload").collect():
        mean, ent, feat = MM._decode_payload_stub(bytes(row["payload"]))
        g = got[row["asset_id"]]
        assert g["n_bytes"] == len(bytes(row["payload"]))
        assert math.isclose(g["byte_mean"], mean, rel_tol=1e-9)
        assert math.isclose(g["byte_entropy"], ent, rel_tol=1e-9)
        assert len(g["feature"]) == MM.FEATURE_DIM
        assert all(
            math.isclose(a, b, rel_tol=1e-6) for a, b in zip(g["feature"], feat)
        )


def test_frame_sample_never_scans_payload(spark):
    """Frame planning is metadata-only: the documents scan must not
    read `text` (the payload source column) — at 100 TB this is the
    difference between scanning bytes and scanning a catalog."""
    m = MM.with_media_columns(load_table(spark, SF_SMOKE, "documents"))
    frames = MM.frame_sample(m, every_ms=2000)
    cols = audit.scanned_columns(frames)
    assert "text" not in cols, f"payload column scanned: {cols}"
    assert "doc_id" in cols and "n_chars" in cols


def test_resize_only_touches_images(spark):
    m = MM.with_media_columns(load_table(spark, SF_SMOKE, "documents"))
    r = MM.resize_images(m, 224, 224)
    rows = r.select("media.kind", "media.width", "media.height").collect()
    for row in rows:
        if row["kind"] == "image":
            assert row["width"] == 224 and row["height"] == 224
        else:
            assert row["width"] is None


def test_multimodal_oracles_at_smoke_sf(spark):
    q, o = entrymod.queries(), entrymod.oracle_sql()
    for name in (
        "multimodal_metadata_stats",
        "multimodal_frame_sample",
        "multimodal_resize_metadata",
    ):
        errs = compare_query(spark, SF_SMOKE, q[name], o[name])
        assert not errs, f"{name}: {errs}"


def test_decode_features_arrow_equals_pandas_path(spark):
    """mapInArrow and mapInPandas decode paths must produce identical
    rows — same stub decoder, two interop layers. The Arrow path skips
    the per-batch Arrow→pandas payload copy, which is the one a
    binary-heavy pipeline would run at scale."""
    m0 = MM.with_media_columns(load_table(spark, SF_SMOKE, "documents").limit(50))
    # include a NULL payload row: both paths must share the
    # empty-bytes convention (zero-stats, no TypeError)
    m = m0.withColumn(
        "payload",
        F.when(F.col("asset_id") % 17 == 3, F.lit(None)).otherwise(
            F.col("payload")
        ),
    )
    a = sorted(
        MM.decode_features_arrow(m).collect(), key=lambda r: r["asset_id"]
    )
    p = sorted(MM.decode_features(m).collect(), key=lambda r: r["asset_id"])
    assert len(a) == len(p) == 50
    for ra, rp in zip(a, p):
        assert ra["asset_id"] == rp["asset_id"]
        assert ra["kind"] == rp["kind"]
        assert ra["n_bytes"] == rp["n_bytes"]
        assert abs(ra["byte_mean"] - rp["byte_mean"]) < 1e-12
        assert abs(ra["byte_entropy"] - rp["byte_entropy"]) < 1e-12
        assert ra["feature"] == rp["feature"]


def test_audio_window_energy_frames_and_nulls(spark):
    """Frame arithmetic pinned locally: window count = ceil(bytes/W),
    the final partial frame carries its true length, energy follows
    the floor(x*1e4+0.5)/1e4 idiom, NULL/empty payloads emit nothing
    (no TypeError), and non-audio assets never appear."""
    import math

    import numpy as np

    from oamap_spark.operators import multimodal as MM
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    m0 = MM.with_media_columns(docs)
    m = m0.withColumn(
        "payload",
        F.when(F.col("asset_id") % 10 == 1, F.lit(None)).otherwise(
            F.col("payload")
        ),
    )
    rows = MM.audio_window_energy(m, window_bytes=256).collect()
    got = {}
    for r in rows:
        got.setdefault(r["asset_id"], []).append(r)
    src = {
        r["asset_id"]: (r["kind"], r["payload"])
        for r in m.select(
            "asset_id", F.col("media.kind").alias("kind"), "payload"
        ).collect()
    }
    for aid, (kind, payload) in src.items():
        if kind != "audio" or payload is None or len(payload) == 0:
            assert aid not in got, (aid, kind)
            continue
        frames = sorted(got[aid], key=lambda r: r["win_idx"])
        assert len(frames) == math.ceil(len(payload) / 256)
        assert sum(f["win_bytes"] for f in frames) == len(payload)
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        for f in frames:
            frame = arr[f["win_idx"] * 256 : f["win_idx"] * 256 + 256]
            rms = float(np.sqrt((frame * frame).sum() / frame.size))
            assert f["energy"] == np.floor(rms * 1e4 + 0.5) / 1e4
    assert any(kind == "audio" and payload is None for kind, payload in src.values())
