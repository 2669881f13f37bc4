"""Exactly-invertible preprocessing analogs (preprocess.py): warp/dewarp,
upscale/collapse, speckle/denoise, crop vocabulary — M1/M2/M6-M11 parity."""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.fonts import decode_bitmap, render_text  # noqa: E402
from ocr_spark.preprocess import (  # noqa: E402
    CROP_MODES,
    QUARTER_MODES,
    add_speckles,
    crop_image,
    crop_region,
    frame_image,
    quadrant_of,
    rotate_small,
    try_collapse_upscale,
    try_derotate,
    try_dewarp,
    upscale,
    warp_image,
)

TEXTS = [
    "VOUCHER 1234 5678 9012 3456",
    "GRID VALUE\nTOKEN BATCH QUERY",
    "A",
    "CLAIM REDEEM\nOFFER TOTAL\nLINE ORDER PART",
]


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("slope", [-8, -3, 3, 5, 8])
def test_warp_dewarp_roundtrip(text, slope):
    img = render_text(text)
    warped = warp_image(img, slope, 16)
    assert warped.shape != img.shape
    rect = try_dewarp(warped, 64)
    assert np.array_equal(rect, img)
    assert decode_bitmap(warped) == text


def test_dewarp_identity_on_unframed():
    for text in TEXTS:
        img = render_text(text)
        assert try_dewarp(img, 64) is img
        rot = np.ascontiguousarray(np.rot90(img, 1))
        assert try_dewarp(rot, 64) is rot


def test_warp_composes_with_rotation():
    img = render_text("TOKEN 9999 8888 7777 6666\nBATCH LINE")
    for k in (1, 2, 3):
        rot = np.ascontiguousarray(np.rot90(img, k))
        warped = warp_image(rot, 5, 16)
        assert decode_bitmap(warped) == "TOKEN 9999 8888 7777 6666\nBATCH LINE"


@pytest.mark.parametrize("k", [2, 3])
def test_upscale_collapse_roundtrip(k):
    img = render_text("SCAN SORT JOIN\nGROUP WINDOW")
    up = upscale(img, k)
    assert up.shape == (img.shape[0] * k, img.shape[1] * k)
    assert np.array_equal(try_collapse_upscale(up), img)
    assert decode_bitmap(up) == "SCAN SORT JOIN\nGROUP WINDOW"


def test_collapse_identity_on_plain():
    img = render_text("STREAM CODE VOUCHER CARD")
    assert try_collapse_upscale(img) is img


def test_speckle_denoise_decode():
    rng = random.Random(7)
    for text in TEXTS:
        img = render_text(text)
        noisy = add_speckles(img, rng, max(4, img.size // 150))
        assert (noisy != img).sum() > 0
        assert decode_bitmap(noisy) == text


def test_speckle_upscale_rotate_compose():
    rng = random.Random(11)
    text = "MERGE SCAN 4321 8765 2109 6543"
    img = add_speckles(render_text(text), rng, 12)
    up = upscale(img, 2)
    for k in (0, 1, 2, 3):
        rot = np.ascontiguousarray(np.rot90(up, k))
        assert decode_bitmap(rot) == text


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("a", [-12, -8, -5, -2, -1, 1, 2, 3, 5, 8, 12])
def test_skew_derotate_roundtrip(text, a):
    """Continuous-angle three-shear rotation is detected and inverted
    bit-exactly (reference deskew, image_utils.py:268-306)."""
    for ink in (255, 90):
        img = render_text(text, ink=ink)
        rot = rotate_small(img, a, ink=ink)
        assert rot.shape != img.shape
        back = try_derotate(rot, 64)
        if back is rot:
            # degenerate tiny-angle/narrow case: the vertical shear
            # rounded to zero everywhere, so the "rotation" is a pure
            # row-shear — routed to try_dewarp, which inverts it
            assert np.array_equal(try_dewarp(rot, 64), img)
        else:
            assert np.array_equal(back, frame_image(img, ink=ink))
        # full chain: derotate -> dewarp strips the frame -> decode
        assert decode_bitmap(rot) == text


def test_derotate_identity_on_unrotated():
    for text in TEXTS:
        img = render_text(text)
        assert try_derotate(img, 64) is img
    warped = warp_image(render_text("PASS THROUGH"), 5, 16)
    assert try_derotate(warped, 64) is warped
    noise = (np.arange(40 * 40, dtype=np.int64) % 60).astype(
        np.uint8).reshape(40, 40)
    assert try_derotate(noise, 64) is noise


def test_skew_composes_with_variants():
    rng = random.Random(5)
    text = "SKEW MIX 1111 2222 3333 4444"
    base = render_text(text, ink=200)
    for img in (
        add_speckles(base, rng, 10, ink=200),
        upscale(base, 2),
        np.ascontiguousarray(np.rot90(base, 1)),
        np.ascontiguousarray(np.rot90(upscale(base, 3), 2)),
    ):
        for a in (-6, 4):
            assert decode_bitmap(rotate_small(img, a, ink=200)) == text


def test_faint_cascade_decodes_subthreshold_ink():
    """R6 analog: ink below the primary binarize threshold is recovered
    by the confidence-gated faint re-OCR pass (reference
    tesseract.js:136-183), composed with every other variant."""
    rng = random.Random(13)
    text = "FAINT 9876 5432 1098 7654\nLINE TWO"
    for ink in (32, 40, 56):
        img = render_text(text, ink=ink)
        assert decode_bitmap(img) == text
        for v in (
            warp_image(img, 5, 16, ink=ink),
            rotate_small(img, -4, ink=ink),
            upscale(img, 2),
            np.ascontiguousarray(np.rot90(img, 3)),
            add_speckles(img, rng, 8, ink=ink),
        ):
            assert decode_bitmap(v) == text


def test_faint_cascade_rejects_noise():
    """Sub-threshold noise blobs must NOT be resurrected by the faint
    pass — the confidence bar keeps them empty."""
    rng = random.Random(21)
    for _ in range(10):
        h, w = rng.randint(16, 48), rng.randint(16, 48)
        noise = np.array(
            [rng.randrange(0, 60) for _ in range(h * w)], dtype=np.uint8
        ).reshape(h, w)
        assert decode_bitmap(noise) == ""


def test_crop_regions_tile_the_image():
    w, h = 31, 17
    for pair in (("top_half", "bottom_half"), ("left_half", "right_half")):
        areas = [crop_region(w, h, m) for m in pair]
        assert sum(cw * ch for _, _, cw, ch in areas) == w * h
    q_areas = [crop_region(w, h, m) for m in QUARTER_MODES]
    assert sum(cw * ch for _, _, cw, ch in q_areas) == w * h
    full = crop_region(w, h, "full")
    assert full == (0, 0, w, h)


def test_crop_image_matches_slices():
    img = render_text("QUERY TABLE MERGE\nSORT JOIN GROUP")
    h, w = img.shape
    assert np.array_equal(crop_image(img, "top_half"), img[: h // 2])
    assert np.array_equal(crop_image(img, "right_half"), img[:, w // 2:])
    assert np.array_equal(crop_image(img, "quarter_4"),
                          img[h // 2:, w // 2:])


def test_quadrant_of():
    assert quadrant_of(1, 1, 10, 10) == "quarter_1"
    assert quadrant_of(9, 1, 10, 10) == "quarter_2"
    assert quadrant_of(1, 9, 10, 10) == "quarter_3"
    assert quadrant_of(9, 9, 10, 10) == "quarter_4"


def test_corpus_variants_all_decode(spark):
    """Every stored corpus variant round-trips through the full Spark
    recognizer (the flagship equality gate in miniature)."""
    from ocr_spark.datagen import generate_corpus
    from ocr_spark.operators.ocr import recognize_blobs

    tables = generate_corpus(n_docs=400, seed=43)
    pdf = tables["media_blobs"].to_pandas()
    variants = set(pdf["variant"])
    # the generator must actually exercise the new surface
    assert any("warped" in v for v in variants)
    assert any("speckled" in v for v in variants)
    assert any("upscaled" in v for v in variants)
    assert any("rotated" in v for v in variants)
    blobs = spark.createDataFrame(pdf)
    got = {r["media_ref"]: r["text"]
           for r in recognize_blobs(blobs).collect()}
    for _, row in pdf.iterrows():
        assert got[row["media_ref"]] == row["ground_text"], row["variant"]


def test_crop_blob_variants_operator(spark):
    from ocr_spark.datagen import generate_corpus
    from ocr_spark.operators.ocr import crop_blob_variants

    tables = generate_corpus(n_docs=40, seed=44)
    pdf = tables["media_blobs"].to_pandas()
    blobs = spark.createDataFrame(pdf)
    crops = crop_blob_variants(blobs).collect()
    n_modes = len(CROP_MODES) + len(QUARTER_MODES)
    assert len(crops) == len(pdf) * n_modes
    by_ref = {(r["crop"], r["media_ref"]): r for r in crops}
    from ocr_spark.png_codec import blob_to_array

    src = pdf.iloc[0]
    img = blob_to_array(src["pixels"], src["height"], src["width"])
    top = by_ref[("top_half", src["media_ref"])]
    got = np.frombuffer(top["pixels"], dtype=np.uint8).reshape(
        top["height"], top["width"])
    assert np.array_equal(got, img[: img.shape[0] // 2])
