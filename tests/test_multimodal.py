"""Multimodal binary-column plumbing: real image resize, stubbed (but
schema/batch-shape real) video frame sampling and audio features."""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.fonts import render_text  # noqa: E402
from ocr_spark.operators.multimodal import (  # noqa: E402
    MEDIA_SCHEMA,
    N_MEL,
    audio_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    img = render_text("GRID VALUE TOKEN\nBATCH QUERY TABLE")
    rows = [
        ("img-1", "image", img.tobytes(),
         (img.shape[1], img.shape[0], None, None, None)),
        ("aud-1", "audio", b"\x01\x02" * 512, (None, None, 16000, 1000, None)),
        ("vid-1", "video", b"\x03\x04" * 1024, (None, None, None, 1000, 25)),
        ("vid-2", "video", b"\x05\x06" * 64, (None, None, None, 90, 3)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA), img


def test_resize_images_real_nearest_neighbor(media):
    df, img = media
    out = {r["asset_id"]: r for r in resize_images(df, 12, 9).collect()}
    assert set(out) == {"img-1"}  # kind predicate keeps images only
    r = out["img-1"]
    got = np.frombuffer(r["payload"], dtype=np.uint8).reshape(9, 12)
    h, w = img.shape
    ys = (np.arange(9) * h) // 9
    xs = (np.arange(12) * w) // 12
    assert np.array_equal(got, img[ys[:, None], xs[None, :]])


def test_sample_frames_geometry_and_stub(media):
    df, _ = media
    rows = sample_frames(df, every_ms=200).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 1000 ms at 200 ms cadence -> 5 frames; 90 ms -> 1 frame
    assert len(by_asset["vid-1"]) == 5
    assert len(by_asset["vid-2"]) == 1
    v1 = sorted(by_asset["vid-1"], key=lambda r: r["ts_ms"])
    assert [r["ts_ms"] for r in v1] == [0, 200, 400, 600, 800]
    assert [r["frame_no"] for r in v1] == [0, 5, 10, 15, 20]
    # the stub decode is deterministic and documented
    payload = b"\x03\x04" * 1024
    want = hashlib.md5(payload + (10).to_bytes(4, "big")).digest()
    assert bytes(v1[2]["frame"]) == want


def test_audio_features_shape(media):
    df, _ = media
    rows = audio_features(df).collect()
    assert {r["asset_id"] for r in rows} == {"aud-1"}
    r = rows[0]
    assert r["n_windows"] == 40  # 1000 ms / 25 ms
    assert len(r["features"]) == N_MEL
    assert all(0.0 <= x < 1.0 for x in r["features"])
    # deterministic across invocations
    again = audio_features(df).collect()[0]
    assert again["features"] == r["features"]


def test_payload_bytes_pruned_from_metadata_scans(spark, media, tmp_path):
    """Metadata-only queries over a parquet media table must not read
    payload bytes: column pruning reaches the scan (the property that
    makes opaque-binary + typed-metadata the right 100 TB schema)."""
    df, _ = media
    path = str(tmp_path / "media.parquet")
    df.write.parquet(path)
    meta_only = spark.read.parquet(path).select(
        "asset_id", "kind", "meta.duration_ms")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    schemas = [ln.split("ReadSchema:", 1)[1]
               for ln in plan.splitlines() if "ReadSchema:" in ln]
    assert schemas and all("payload" not in s for s in schemas), plan
    # nested pruning: only duration_ms survives from the meta struct
    assert "duration_ms" in schemas[0] and "sample_rate" not in schemas[0]
