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


def test_hand_assembled_external_stream_nonuniform_dqt():
    """Interchange check the self-roundtrip tests can't give: a baseline
    stream assembled BYTE BY BYTE here — segment layout, canonical
    Huffman codes, and entropy bits all written by test-local logic, not
    by encode_jpeg — with a FULLY non-uniform DQT (step i+1 at zigzag
    index i, all 64 distinct). Expected pixels come from a test-local
    dequantize + IDCT. Any disagreement between this decoder and the
    T.81 interchange format (including the zigzag-vs-row-major DQT
    domain fixed in round 4) shows up as a pixel error here.

    Only the Annex K table CONSTANTS are imported (spec data); every
    piece of encoding logic is re-derived in this test."""
    from ocr_spark.jpeg_codec import (
        AC_BITS,
        AC_VALS,
        DC_BITS,
        DC_VALS,
        decode_jpeg,
    )

    # --- test-local canonical Huffman code assignment (T.81 C.2) -------
    def canonical(bits, vals):
        out, code = {}, 0
        i = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[vals[i]] = (length, code)
                code += 1
                i += 1
            code <<= 1
        return out

    dc_codes = canonical(DC_BITS, DC_VALS)
    ac_codes = canonical(AC_BITS, AC_VALS)

    # --- test-local bit writer with FF-stuffing -------------------------
    bitbuf = []

    def put(code, length):
        bitbuf.extend((code >> (length - 1 - i)) & 1 for i in range(length))

    def put_value(v):
        """magnitude category + offset bits per T.81 F.1.2.1."""
        size = int(v != 0 and int(abs(v)).bit_length())
        bits = v if v >= 0 else v + (1 << size) - 1
        return size, bits

    # one 8x8 block, coefficients chosen in ZIGZAG order:
    #   DC (zz 0) = 8, AC at zz 1 = 3, AC at zz 5 = -2, rest 0.
    # zz 1 and zz 5 map to DIFFERENT row-major cells (1 and 2), so a
    # decoder applying the non-uniform table in the wrong domain scales
    # both wrongly.
    size, bits = put_value(8)                      # DC diff = 8 (prev 0)
    length, code = dc_codes[size]
    put(code, length)
    put(bits, size)
    size, bits = put_value(3)                      # run 0, value 3
    length, code = ac_codes[(0 << 4) | size]
    put(code, length)
    put(bits, size)
    size, bits = put_value(-2)                     # run 3 (zz 2..4 zero)
    length, code = ac_codes[(3 << 4) | size]
    put(code, length)
    put(bits, size)
    length, code = ac_codes[0x00]                  # EOB
    put(code, length)
    while len(bitbuf) % 8:                         # pad with 1s (F.1.2.3)
        bitbuf.append(1)
    entropy = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = int("".join(map(str, bitbuf[i:i + 8])), 2)
        entropy.append(byte)
        if byte == 0xFF:
            entropy.append(0x00)                   # byte stuffing

    # --- segments --------------------------------------------------------
    import struct

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    q_z = bytes(i + 1 for i in range(64))          # zigzag-ordered steps
    stream = (
        b"\xff\xd8"
        + seg(0xFFDB, b"\x00" + q_z)
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
        + seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        + bytes(entropy)
        + b"\xff\xd9"
    )

    # --- expected pixels, computed independently -------------------------
    zigzag_rm = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    coef_zz = np.zeros(64, dtype=np.int64)
    coef_zz[0] = 8 * (0 + 1)                       # x step at zz 0
    coef_zz[1] = 3 * (1 + 1)                       # x step at zz 1
    coef_zz[5] = -2 * (5 + 1)                      # x step at zz 5
    rm = np.zeros(64, dtype=np.float64)
    rm[zigzag_rm] = coef_zz
    C = rm.reshape(8, 8)
    T = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else 0.5
            T[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    block = T.T @ C @ T
    want = np.clip(np.round(block + 128.0), 0, 255).astype(np.uint8)

    got = decode_jpeg(stream)
    assert got.shape == (8, 8)
    err = np.abs(got.astype(int) - want.astype(int)).max()
    assert err <= 1, f"external-stream decode mismatch (max err {err})"
    # and the non-uniform steps genuinely mattered: the same coefficients
    # under a FLAT table give different pixels, so a pass can't come from
    # a decoder that ignores the DQT payload
    flat = np.zeros(64, dtype=np.float64)
    flat[zigzag_rm] = [8, 3, 0, 0, 0, -2] + [0] * 58
    assert np.abs((T.T @ flat.reshape(8, 8) @ T) - block).max() > 2
