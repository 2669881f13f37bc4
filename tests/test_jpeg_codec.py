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


# ITU T.81 Annex K.1 luminance table, in zigzag order as a DQT stores it.
_K1_ZIGZAG = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
], dtype=np.int64)


def test_nonuniform_quant_table_dequantizes_in_zigzag_domain():
    """Regression for the round-3 ADVICE defect: DQT payloads are stored
    in ZIGZAG order (T.81 B.2.4.1), so dequantization must happen before
    the de-zigzag scatter. Under the old row-major dequant, a stream
    quantized with the Annex K.1 table decoded with coefficient deltas up
    to ~123 — i.e. visibly wrong pixels from any external encoder with a
    non-flat table. With the fix, the roundtrip error is bounded by the
    table's own quantization loss."""
    rng = np.random.RandomState(7)
    # smooth low-frequency content: K.1 quantization loss stays small, so
    # an ordering bug (which mis-scales LOW-frequency coefficients by
    # HIGH-frequency steps) is loudly visible against the bound
    yy, xx = np.mgrid[0:48, 0:64]
    img = (128 + 60 * np.sin(yy / 9.0) * np.cos(xx / 11.0)).astype(np.uint8)
    data = encode_jpeg(img, quant=_K1_ZIGZAG)
    dec = decode_jpeg(data)
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert err <= 16, f"max pixel error {err} — zigzag/row-major mixup?"

    # a deliberately asymmetric table: step 255 at zigzag position 2
    # (row-major index 8 = vertical frequency), step 1 elsewhere. Stripes
    # along x have NO energy at row-major index 1 (horizontal frequency),
    # so a decoder that applies the table in row-major order scales the
    # wrong coefficient and flattens the stripes.
    qt = np.ones(64, dtype=np.int64)
    qt[2] = 255
    stripes = np.zeros((8, 8), dtype=np.uint8)
    stripes[::2, :] = 200
    dec2 = decode_jpeg(encode_jpeg(stripes, quant=qt))
    # with correct zigzag dequant only the (1,0) coefficient is coarse;
    # the stripe pattern's dominant coefficients (rows 2,4,6 of column 0)
    # survive — the image must stay strongly striped
    contrast = int(dec2[::2, :].mean()) - int(dec2[1::2, :].mean())
    assert contrast > 100, f"stripe contrast {contrast}: wrong-domain dequant"


def test_encoder_writes_dqt_payload_in_zigzag_order():
    """The DQT segment must carry the table exactly as passed (zigzag
    order) so external baseline decoders dequantize our streams right."""
    img = _glyph_page()
    data = encode_jpeg(img, quant=_K1_ZIGZAG)
    i = data.index(b"\xff\xdb")
    payload = data[i + 4:i + 4 + 65]  # Pq/Tq byte + 64 steps
    assert payload[0] == 0
    assert list(payload[1:]) == _K1_ZIGZAG.tolist()
