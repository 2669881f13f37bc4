"""Multimodal media columns: opaque binary + typed metadata, with
decode / resize / frame-sample / feature-extract as Arrow-batched
operators.

The engine treats every media payload as an opaque ``binary`` column plus
a typed metadata struct — the only schema that survives 100 TB (pixels /
samples never shuffle; metadata prunes). Image ops are REAL over this
repo's raw-bitmap domain (the same pixels the OCR path reads). Audio and
video decoding need codec libraries that do not ship in this sandbox, so
the decode step is stubbed exactly as a production skeleton would be:
``try: import librosa/av`` and otherwise a clearly-marked deterministic
fake (md5-derived values) — the Spark-side plumbing (schemas, mapInPandas
signatures, per-batch shapes, explode geometry) is real and tested.

Reference parity: the reference canonicalizes every input through PNG
decode (/root/reference/src/ocr/cli.py:100-112, incl. AVIF via imageio)
and resizes/upscales before OCR (optimize-image.js:28-32); frame
sampling mirrors its live-camera path, one frame every 200 ms
(/root/reference/src/public/live.js:56-81).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META_TYPE),
])


# --------------------------------------------------------------------------
# images: REAL ops over the raw-bitmap domain
# --------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of image assets to (out_w, out_h).

    Real computation (index-map resample per Arrow batch, one numpy
    gather per image); non-image rows are filtered out by predicate
    pushdown on `kind` before any payload bytes are read."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, px, m in zip(pdf["asset_id"], pdf["payload"],
                                  pdf["meta"]):
                h, w = int(m["height"]), int(m["width"])
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = img[ys[:, None], xs[None, :]]
                rows.append((aid, out_w, out_h,
                             np.ascontiguousarray(out).tobytes()))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "payload"])

    imgs = media.filter(F.col("kind") == "image").select(
        "asset_id", "payload", "meta")
    return imgs.mapInPandas(_resize, schema=RESIZED_SCHEMA)


# --------------------------------------------------------------------------
# video: frame sampling (decode stubbed, plumbing real)
# --------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("frame_no", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def _decode_frame_stub(payload: bytes, frame_no: int) -> bytes:
    """STUB: no video codec ships in this sandbox. Deterministic fake —
    16 md5-derived bytes per frame — so tests can assert exact values;
    swap for `av`/ffmpeg frame extraction in production."""
    return hashlib.md5(payload + frame_no.to_bytes(4, "big")).digest()


def sample_frames(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """One frame every `every_ms` of video (the reference's live-camera
    cadence, live.js:81). The frame-count/timestamp geometry comes from
    REAL metadata; only the per-frame pixel decode is the documented
    deterministic stub."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, px, m in zip(pdf["asset_id"], pdf["payload"],
                                  pdf["meta"]):
                dur = int(m["duration_ms"])
                n_frames = int(m["n_frames"])
                for i, ts in enumerate(range(0, dur, every_ms)):
                    frame_no = min(n_frames - 1, (ts * n_frames) // max(dur, 1))
                    rows.append((aid, frame_no, ts,
                                 _decode_frame_stub(px, frame_no)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "ts_ms", "frame"])

    vids = media.filter(F.col("kind") == "video").select(
        "asset_id", "payload", "meta")
    return vids.mapInPandas(_sample, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# audio: feature extraction (decode stubbed behind an import-try)
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

N_MEL = 8  # feature width (MFCC-shaped)


def _audio_features_one(payload: bytes, sample_rate: int,
                        duration_ms: int) -> tuple[int, list[float]]:
    """Per-asset feature vector. Real libraries are absent in this
    container, so the spectral decode is a deterministic md5-derived
    fake with the REAL output geometry: one N_MEL-wide window per 25 ms
    of audio, mean-pooled to a single vector."""
    try:  # pragma: no cover - librosa does not ship in this sandbox
        import librosa  # noqa: F401

        raise NotImplementedError(
            "wire librosa.feature.mfcc here when codecs are available")
    except ImportError:
        pass
    n_windows = max(1, duration_ms // 25)
    seed = hashlib.md5(payload).digest()
    vals = np.frombuffer(
        hashlib.md5(seed + sample_rate.to_bytes(4, "big")).digest()
        * ((N_MEL * 4) // 16 + 1),
        dtype=np.uint32,
    )[:N_MEL]
    feats = (vals.astype(np.float64) / 2**32).astype(np.float32)
    return n_windows, [float(x) for x in feats]


def audio_features(media: DataFrame) -> DataFrame:
    """(asset_id, n_windows, features[N_MEL]) per audio asset."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, px, m in zip(pdf["asset_id"], pdf["payload"],
                                  pdf["meta"]):
                n, f = _audio_features_one(
                    px, int(m["sample_rate"]), int(m["duration_ms"]))
                rows.append((aid, n, f))
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_windows", "features"])

    auds = media.filter(F.col("kind") == "audio").select(
        "asset_id", "payload", "meta")
    return auds.mapInPandas(_feat, schema=AUDIO_FEATURES_SCHEMA)
