"""From-scratch baseline JPEG codec (ocr_spark/jpeg_codec.py)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.jpeg_codec import decode_jpeg, encode_jpeg  # noqa: E402
from ocr_spark.png_codec import blob_to_array  # noqa: E402


def _glyph_page() -> np.ndarray:
    img = np.zeros((50, 70), dtype=np.uint8)
    img[5:15, 5:65] = 255
    img[20:30, 10:40] = 160
    img[38:44, 2:20] = 96
    return img


def test_roundtrip_near_lossless_on_pages():
    """quant=1 roundtrip error is bounded by FDCT/IDCT rounding: <= 2,
    far inside every binarize margin the recognizer uses."""
    rng = np.random.RandomState(11)
    cases = [
        _glyph_page(),
        rng.randint(0, 256, (41, 33)).astype(np.uint8),     # dense worst case
        np.tile(np.arange(64, dtype=np.uint8) * 4, (16, 1)),  # gradient
        np.full((9, 13), 200, dtype=np.uint8),              # flat
        np.array([[0]], dtype=np.uint8),                    # 1x1
    ]
    for img in cases:
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= 2, (img.shape, err)


def test_stream_is_structurally_valid_baseline():
    """Markers in order, Annex K tables declared, EOI-terminated."""
    data = encode_jpeg(_glyph_page())
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    # SOF0 carries the true (unpadded) dimensions
    sof = data.index(b"\xff\xc0")
    h = int.from_bytes(data[sof + 5:sof + 7], "big")
    w = int.from_bytes(data[sof + 7:sof + 9], "big")
    assert (h, w) == (50, 70)


def test_byte_stuffing_roundtrip():
    """An image engineered to produce 0xFF entropy bytes still decodes
    (stuffed FF00 sequences are unstuffed)."""
    rng = np.random.RandomState(3)
    for _ in range(5):
        img = rng.randint(0, 256, (24, 24)).astype(np.uint8)
        data = encode_jpeg(img)
        sos = data.index(b"\xff\xda")
        entropy = data[sos:-2]
        dec = decode_jpeg(data)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
        if b"\xff\x00" in entropy:
            return  # at least one case exercised stuffing
    pytest.skip("no stuffed byte produced in 5 random images")


def test_blob_dispatch_sniffs_jpeg():
    img = _glyph_page()
    out = blob_to_array(encode_jpeg(img), *img.shape)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    with pytest.raises(ValueError, match="dims"):
        blob_to_array(encode_jpeg(img), img.shape[0] + 1, img.shape[1])


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no SOF/SOS
