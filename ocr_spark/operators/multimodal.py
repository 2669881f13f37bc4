"""Multimodal media columns: opaque binary + typed metadata, with
decode / resize / frame-sample / feature-extract as Arrow-batched
operators.

The engine treats every media payload as an opaque ``binary`` column plus
a typed metadata struct — the only schema that survives 100 TB (pixels /
samples never shuffle; metadata prunes). Image ops are REAL over this
repo's raw-bitmap domain (the same pixels the OCR path reads). Audio ops
are REAL too: stdlib ``wave`` decode + ``np.fft`` windowed band energies
(no codec library required). Video ops are REAL as well: payloads use an
indexed motion-PNG container (make_mpng) and frame sampling
random-access-decodes exactly the sampled frames through the
from-scratch png_codec; malformed assets of any kind are skipped rather
than failing the task.

Reference parity: the reference canonicalizes every input through PNG
decode (/root/reference/src/ocr/cli.py:100-112, incl. AVIF via imageio)
and resizes/upscales before OCR (optimize-image.js:28-32); frame
sampling mirrors its live-camera path, one frame every 200 ms
(/root/reference/src/public/live.js:56-81).
"""

from __future__ import annotations

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
        from ..png_codec import blob_to_array

        for pdf in batches:
            rows = []
            for aid, px, m in zip(pdf["asset_id"], pdf["payload"],
                                  pdf["meta"]):
                h, w = int(m["height"]), int(m["width"])
                img = blob_to_array(px, h, w)
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
# video: frame sampling over the indexed motion-PNG container
# --------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("frame_no", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),      # raw grayscale bitmap
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


MPNG_MAGIC = b"MPNG1"


def make_mpng(frames: list[np.ndarray]) -> bytes:
    """Indexed motion-PNG container — the engine's video payload format:
    magic, u32 frame count, u32 per-frame byte-length table, then each
    frame as a standalone PNG (png_codec). The index makes single-frame
    decode O(frame bytes), not O(video bytes) — the property frame
    sampling needs at scale (decode k sampled frames, never the whole
    asset)."""
    import struct

    from ..png_codec import encode_png

    blobs = [encode_png(f) for f in frames]
    head = MPNG_MAGIC + struct.pack(">I", len(blobs)) + b"".join(
        struct.pack(">I", len(b)) for b in blobs
    )
    return head + b"".join(blobs)


def _decode_frame(payload: bytes,
                  frame_no: int) -> tuple[bytes, int, int] | None:
    """Random-access decode of ONE MPNG frame -> (raw grayscale bytes,
    width, height); None on foreign/corrupt payloads or out-of-range
    frame numbers (malformed assets are skipped, never fatal)."""
    import struct

    from ..png_codec import decode_png

    if not payload.startswith(MPNG_MAGIC):
        return None
    try:
        n = struct.unpack_from(">I", payload, len(MPNG_MAGIC))[0]
        if not 0 <= frame_no < n:
            return None
        table_at = len(MPNG_MAGIC) + 4
        lens = struct.unpack_from(f">{n}I", payload, table_at)
        off = table_at + 4 * n + sum(lens[:frame_no])
        img = decode_png(payload[off:off + lens[frame_no]])
        return img.tobytes(), img.shape[1], img.shape[0]
    except Exception:
        return None


def sample_frames(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """One frame every `every_ms` of video (the reference's live-camera
    cadence, live.js:81). Geometry comes from the metadata; the sampled
    frames are REALLY decoded from the indexed motion-PNG payload
    (make_mpng) — only the sampled frames' bytes are inflated."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, px, m in zip(pdf["asset_id"], pdf["payload"],
                                  pdf["meta"]):
                # Malformed assets (null meta, zero frames/duration,
                # undecodable payload) are skipped, not fatal: one bad
                # row must not kill a task holding millions of good rows.
                if m is None:
                    continue
                dur = int(m["duration_ms"] or 0)
                n_frames = int(m["n_frames"] or 0)
                if dur <= 0 or n_frames <= 0:
                    continue
                for ts in range(0, dur, every_ms):
                    frame_no = min(n_frames - 1, (ts * n_frames) // dur)
                    dec = _decode_frame(px, frame_no)
                    if dec is None:
                        continue
                    frame, w, h = dec
                    rows.append((aid, frame_no, ts, frame, w, h))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "ts_ms", "frame",
                               "width", "height"])

    vids = media.filter(F.col("kind") == "video").select(
        "asset_id", "payload", "meta")
    return vids.mapInPandas(_sample, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# audio: REAL feature extraction (stdlib WAV decode + windowed FFT bands)
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

N_MEL = 8          # feature width (MFCC-shaped band count)
WINDOW_MS = 25     # analysis window (hop == window, no overlap)


def make_wav(freqs_hz: list[float], duration_ms: int,
             sample_rate: int = 16000, amplitude: float = 0.5) -> bytes:
    """Synthesize a 16-bit PCM mono WAV of summed sine tones (stdlib
    ``wave`` writer). The sandbox-side generator for audio payloads —
    deterministic, so tests and datagen produce identical bytes."""
    import io
    import wave

    n = (sample_rate * duration_ms) // 1000
    t = np.arange(n, dtype=np.float64) / sample_rate
    sig = np.zeros(n, dtype=np.float64)
    for f in freqs_hz:
        sig += np.sin(2.0 * np.pi * f * t)
    if freqs_hz:
        sig *= amplitude / len(freqs_hz)
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _wav_decode(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a PCM WAV payload to (float64 mono samples in [-1, 1],
    sample_rate); None when the payload is not decodable WAV (the caller
    skips the asset — one bad blob must not fail the task)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            sw = wf.getsampwidth()
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
            rate = wf.getframerate()
    except (wave.Error, EOFError, ValueError):
        return None
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # unsigned 8-bit PCM
        samples = (np.frombuffer(raw, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch]
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate


def _audio_features_one(payload: bytes) -> tuple[int, list[float]] | None:
    """REAL spectral features from a WAV payload: the signal is split
    into 25 ms windows (hop == window), each window's rFFT power spectrum
    is pooled into N_MEL contiguous frequency bands, and log band
    energies are averaged across windows. Equivalent in shape to an
    MFCC-style pipeline minus the mel warp/DCT (stdlib-only: ``wave`` +
    ``np.fft`` — no codec libraries needed, so nothing is stubbed).

    Reference parity: the reference's audio surface is absent (it is an
    OCR app); this operator exists for the LLM-pipeline extension, so the
    contract here is "real decode + real spectral math", verified by
    planting known tones and asserting band-energy concentration."""
    decoded = _wav_decode(payload)
    if decoded is None:
        return None
    samples, rate = decoded
    win = max(1, (rate * WINDOW_MS) // 1000)
    n_windows = max(1, len(samples) // win)
    frames = samples[: n_windows * win].reshape(n_windows, win)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_windows, win//2+1)
    n_bins = spec.shape[1]
    edges = (np.arange(N_MEL + 1) * n_bins) // N_MEL
    bands = np.stack(
        [spec[:, edges[b]:edges[b + 1]].sum(axis=1) for b in range(N_MEL)],
        axis=1,
    )
    feats = np.log10(1.0 + bands).mean(axis=0).astype(np.float32)
    return n_windows, [float(x) for x in feats]


def audio_features(media: DataFrame) -> DataFrame:
    """(asset_id, n_windows, features[N_MEL]) per audio asset; assets
    whose payload is not decodable WAV are skipped (defensive, logged by
    omission into the lineage counts, never fatal)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, px in zip(pdf["asset_id"], pdf["payload"]):
                nf = _audio_features_one(px)
                if nf is None:
                    continue
                rows.append((aid, nf[0], nf[1]))
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_windows", "features"])

    auds = media.filter(F.col("kind") == "audio").select(
        "asset_id", "payload")
    return auds.mapInPandas(_feat, schema=AUDIO_FEATURES_SCHEMA)
