"""Deterministic bitmap glyph font for the synthetic media corpus.

The reference OCRs real photos with Tesseract/EasyOCR (non-deterministic,
model-dependent). Our corpus must be *exactly invertible* so the
north-rule span-sequence-equality gate is a strict equality test
(FIXTURES.md section 2): the generator renders text with this font, and the
recognizer (ocr_spark.operators.ocr) recovers it bit-exactly via
binarize -> row-projection line segmentation -> fixed-pitch template
classification — the same binarize/segment/classify vocabulary the
reference uses (cf. /root/reference/src/ocr/focus_impl.py:21-51,
image_utils.py:123-235), with a deterministic classifier standing in for
the Tesseract LSTM.

Glyphs are 5x7 bitmaps derived from md5(char) bits — arbitrary but fixed,
mutually distinct, with forced ink in the top and bottom rows so a rendered
text line always occupies exactly GLYPH_H consecutive ink rows (makes line
segmentation exact). Space is the all-blank glyph.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
CHAR_PITCH = GLYPH_W + 1  # 1 blank separator column
LINE_PITCH = GLYPH_H + 3  # 3 blank separator rows
ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ-.:/ "


def _glyph_for(ch: str) -> np.ndarray:
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    digest = hashlib.md5(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    g = bits[: GLYPH_H * GLYPH_W].reshape(GLYPH_H, GLYPH_W).astype(np.uint8)
    # Force ink at the four corners: every non-space glyph then spans the
    # full 7 rows and starts at column 0 of its cell -> exact segmentation.
    g[0, 0] = g[0, -1] = g[-1, 0] = g[-1, -1] = 1
    return g


GLYPHS: dict[str, np.ndarray] = {ch: _glyph_for(ch) for ch in ALPHABET}

# Verify mutual distinctness once at import (35-bit patterns; md5-derived).
_seen: dict[bytes, str] = {}
for _ch, _g in GLYPHS.items():
    _key = _g.tobytes()
    if _key in _seen:  # pragma: no cover - would be a generator bug
        raise RuntimeError(f"glyph collision: {_ch!r} vs {_seen[_key]!r}")
    _seen[_key] = _ch

# Flat template matrix for vectorized classification: (n_chars, 35)
TEMPLATE_CHARS = list(ALPHABET)
TEMPLATE_MATRIX = np.stack([GLYPHS[c].reshape(-1) for c in TEMPLATE_CHARS])
# Hamming distance via |c != t| = |c| + |t| - 2*c.t (binary vectors):
# one BLAS matmul instead of a 3D boolean broadcast
_TEMPLATE_T = TEMPLATE_MATRIX.astype(np.int32).T
_TEMPLATE_SUMS = TEMPLATE_MATRIX.sum(axis=1).astype(np.int32)


def render_text(text: str, ink: int = 255) -> np.ndarray:
    """Render text (possibly multi-line) to a uint8 grayscale bitmap.

    Background 0, ink `ink`. Lines are top-aligned at multiples of
    LINE_PITCH; chars at multiples of CHAR_PITCH. Unknown chars render as
    '-'. Returns array of shape (h, w).
    """
    lines = text.split("\n")
    lines = [ln.rstrip() for ln in lines]
    width = max((len(ln) for ln in lines), default=0) * CHAR_PITCH
    height = len(lines) * LINE_PITCH
    img = np.zeros((max(height, 1), max(width, 1)), dtype=np.uint8)
    for li, ln in enumerate(lines):
        y = li * LINE_PITCH
        for ci, ch in enumerate(ln):
            g = GLYPHS.get(ch.upper(), GLYPHS["-"])
            x = ci * CHAR_PITCH
            img[y : y + GLYPH_H, x : x + GLYPH_W] = g * ink
    return img


def detect_rotation(img: np.ndarray, threshold: int = 64) -> int:
    """Detect 0/90/180/270-degree rotation (reference skew-detect +
    upright gate, /root/reference/src/ocr/image_utils.py:268-315,
    focus_pytesseract.py:36-48, rotations image_utils.py:238-265).

    Deterministic criterion: for each candidate de-rotation, classify all
    non-blank cells and sum the template Hamming distances; the true
    orientation of a rendered image scores 0 (glyphs align with the
    fixed pitch), wrong ones don't. Ties (noise/blank) resolve to the
    first candidate in (0, 90, 180, 270) — the upright-bias the
    reference's ±2-degree tolerance gate encodes.
    Returns k such that np.rot90(img, k) is upright.
    """
    binary = (img >= threshold).astype(np.uint8)
    if binary.size == 0 or binary.max() == 0:
        return 0
    best_k, best_score = 0, None
    for k in (0, 1, 2, 3):
        b = np.rot90(binary, k)
        h, w = b.shape
        n_lines = (h + LINE_PITCH - 1) // LINE_PITCH
        n_cells = (w + CHAR_PITCH - 1) // CHAR_PITCH
        padded = np.zeros((n_lines * LINE_PITCH, n_cells * CHAR_PITCH),
                          dtype=np.uint8)
        padded[:h, :w] = b
        cells = (
            padded.reshape(n_lines, LINE_PITCH, n_cells, CHAR_PITCH)
            .transpose(0, 2, 1, 3)[:, :, :GLYPH_H, :GLYPH_W]
        )
        flat = cells.reshape(-1, GLYPH_H * GLYPH_W)
        # cells at/below the speckle budget are noise, not glyphs (real
        # glyphs carry >= 4 forced corner px) — see preprocess.py denoise
        from .preprocess import SPECKLE_INK_MAX

        sums = flat.sum(axis=1, dtype=np.int32)
        inked = flat[sums > SPECKLE_INK_MAX]
        if inked.size == 0:
            continue
        dots = inked.astype(np.int32) @ _TEMPLATE_T
        dists = (sums[sums > SPECKLE_INK_MAX][:, None]
                 + _TEMPLATE_SUMS[None, :] - 2 * dots)
        score = dists.min(axis=1).sum() / max(len(inked), 1)
        if best_score is None or score < best_score:
            best_k, best_score = k, score
            from .preprocess import ROTATION_ACCEPT_SCORE

            if score < ROTATION_ACCEPT_SCORE:
                break  # upright (speckled uprights score < 1; wrong
                # right-angle rotations score ~8+) — same early-accept
                # as the batch recognizer so both decode identically
    return best_k


def _decode_pass(img: np.ndarray, threshold: int) -> tuple[str, float]:
    """One preprocess+binarize+classify pass; returns (text, mean
    min-Hamming over inked cells) — score inf when nothing inks."""
    from .preprocess import (SPECKLE_INK_MAX, try_collapse_upscale,
                             try_derotate, try_dewarp)

    img = try_derotate(img, threshold)
    img = try_dewarp(img, threshold)
    img = try_collapse_upscale(img)
    k = detect_rotation(img, threshold)
    if k:
        img = np.rot90(img, k)
    binary = (img >= threshold).astype(np.uint8)
    if binary.size == 0 or binary.max() == 0:
        return "", float("inf")
    h, w = binary.shape
    n_lines = (h + LINE_PITCH - 1) // LINE_PITCH
    n_cells = (w + CHAR_PITCH - 1) // CHAR_PITCH
    lines: list[str] = []
    dist_total = 0
    inked = 0
    for li in range(n_lines):
        band = binary[li * LINE_PITCH : li * LINE_PITCH + GLYPH_H]
        chars: list[str] = []
        for ci in range(n_cells):
            x = ci * CHAR_PITCH
            cell = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
            patch = band[:, x : x + GLYPH_W]
            cell[: patch.shape[0], : patch.shape[1]] = patch
            if cell.sum() <= SPECKLE_INK_MAX:
                chars.append(" ")
                continue
            flat = cell.reshape(-1)
            dists = np.count_nonzero(TEMPLATE_MATRIX != flat, axis=1)
            dist_total += int(dists.min())
            inked += 1
            chars.append(TEMPLATE_CHARS[int(np.argmin(dists))])
        lines.append("".join(chars).rstrip())
    while lines and not lines[-1]:
        lines.pop()
    score = dist_total / inked if inked else float("inf")
    return "\n".join(lines), score


def decode_bitmap(img: np.ndarray, threshold: int = 64) -> str:
    """Inverse of render_text: binarize -> segment lines -> classify chars.

    Pure-numpy reference decoder used by tests as the oracle; the Spark-side
    recognizer in operators/ocr.py implements the same algorithm batched.

    Preprocessing chain (mirrors the reference's dewarp + optimizeForOCR
    order, see preprocess.py): rectify framed row-shear warps, collapse
    integer upscales, then de-rotate; cell-level denoise happens inside
    classification (speckle-budget blank rule). When the primary
    binarization sees nothing, the faint re-OCR cascade retries at
    FAINT_THRESHOLD and accepts only a confident result (reference
    grey/color/binary retry, src/ocr/tesseract.js:136-183).
    """
    from .preprocess import (FAINT_ACCEPT_SCORE, FAINT_THRESHOLD,
                             normalize_illumination)

    # lit-document polarity first (same router as the Spark recognizer,
    # operators/ocr.py _cascade): photographed-page variants equalize /
    # adaptive-binarize into the canonical dark-background domain
    img = normalize_illumination(img)
    text, _ = _decode_pass(img, threshold)
    if text:
        return text
    if threshold > FAINT_THRESHOLD:
        text, score = _decode_pass(img, FAINT_THRESHOLD)
        if text and score <= FAINT_ACCEPT_SCORE:
            return text
    return ""
