"""Deterministic 5x7 bitmap font.

The container has no image/OCR libraries, so the raster path uses a synthetic
but fully real image pipeline: pages are rasterized with this font and decoded
by template matching (``pdf_ocr_spark.ocr.engine.DeterministicOCREngine``).
Glyph patterns are pseudo-random (seeded per codepoint) — they don't look like
Latin letters, but they are mutually distinct, dense enough to survive
blur/rescale, and 100% reproducible, which is what byte-equality testing needs
(the reference's own tests do the same thing: they exercise layout logic on
synthetic OCR lines, SmartPDF-OCR ``tests/test_ocr.py:14-48``).

Geometry (in font pixels):
  glyph cell  = 5 wide x 7 tall
  intra-word glyph spacing = 2
  word space (the ' ' char) = 5
Constraints enforced per glyph so segmentation/decoding is stable:
  every column has >= 2 ink pixels; rows 0 and 6 are non-empty.
"""

from __future__ import annotations

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
GLYPH_SPACING = 2   # blank columns between glyphs in a word
WORD_SPACE = 5      # advance (blank columns) for a space character

# printable ASCII, space excluded (space is a pure advance)
CHARSET = "".join(chr(c) for c in range(33, 127))


def _lcg_bits(seed: int, n: int) -> np.ndarray:
    """Deterministic bit stream from a 64-bit LCG (no RNG state shared)."""
    out = np.empty(n, dtype=bool)
    x = (seed * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
    for i in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out[i] = (x >> 33) & 1
    return out


def _make_glyph(ch: str) -> np.ndarray:
    """7x5 bool glyph satisfying the density/edge constraints."""
    for salt in range(1, 1000):
        bits = _lcg_bits(ord(ch) * 1000003 + salt, GLYPH_H * GLYPH_W)
        g = bits.reshape(GLYPH_H, GLYPH_W).copy()
        if (g.sum(axis=0) >= 2).all() and g[0].any() and g[-1].any():
            return g
    raise RuntimeError(f"no glyph for {ch!r}")  # pragma: no cover


def _build() -> tuple[dict, np.ndarray, str]:
    glyphs = {}
    used = set()
    order = []
    for ch in CHARSET:
        g = _make_glyph(ch)
        key = g.tobytes()
        # extremely unlikely collision; perturb deterministically if it happens
        salt_extra = 0
        while key in used:  # pragma: no cover
            salt_extra += 1
            g = _make_glyph(chr(ord(ch) + 128 * salt_extra))
            key = g.tobytes()
        used.add(key)
        glyphs[ch] = g
        order.append(ch)
    templates = np.stack([glyphs[c] for c in order]).astype(np.float32)
    return glyphs, templates, "".join(order)


GLYPHS, TEMPLATES, TEMPLATE_CHARS = _build()


def text_width_px(text: str, scale: int = 1) -> int:
    """Rendered pixel width of ``text`` at integer ``scale``."""
    w = 0
    for ch in text:
        if ch == " ":
            w += WORD_SPACE * scale
        else:
            w += (GLYPH_W + GLYPH_SPACING) * scale
    if text and text[-1] != " ":
        w -= GLYPH_SPACING * scale
    return max(w, 0)


def draw_text(canvas: np.ndarray, x: int, y: int, text: str, scale: int = 1,
              ink: int = 0) -> int:
    """Draw ``text`` onto a uint8 grayscale canvas (top-left at x,y).

    Returns the x position after the last glyph. Out-of-bounds pixels are
    clipped. ``ink`` is the glyph gray level (0 = black on white).
    """
    h, w = canvas.shape[:2]
    cx = x
    for ch in text:
        if ch == " ":
            cx += WORD_SPACE * scale
            continue
        g = GLYPHS.get(ch)
        if g is None:  # unknown char: advance like a glyph, draw nothing
            cx += (GLYPH_W + GLYPH_SPACING) * scale
            continue
        big = np.kron(g, np.ones((scale, scale), dtype=bool))
        gh, gw = big.shape
        y0, y1 = max(0, y), min(h, y + gh)
        x0, x1 = max(0, cx), min(w, cx + gw)
        if y1 > y0 and x1 > x0:
            sub = big[y0 - y : y1 - y, x0 - cx : x1 - cx]
            region = canvas[y0:y1, x0:x1]
            region[sub] = ink
        cx += (GLYPH_W + GLYPH_SPACING) * scale
    return cx


def match_glyph(patch: np.ndarray) -> tuple[str, float]:
    """Decode a glyph patch (float 0..1 ink mass, any size) to (char, conf).

    Downsamples to the 7x5 grid by block mean, thresholds at 0.5, returns the
    nearest template by Hamming distance. conf = 1 - hamming/35.
    """
    grid = _downsample(patch, GLYPH_H, GLYPH_W) >= 0.5
    diffs = (TEMPLATES != grid[None].astype(np.float32)).sum(axis=(1, 2))
    idx = int(np.argmin(diffs))
    conf = 1.0 - float(diffs[idx]) / (GLYPH_H * GLYPH_W)
    return TEMPLATE_CHARS[idx], conf


def _downsample(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Block-mean resample of a 2-D float array to (rows, cols)."""
    h, w = a.shape
    # area-weighted binning via cumulative sums at fractional boundaries
    ys = np.linspace(0, h, rows + 1)
    xs = np.linspace(0, w, cols + 1)
    # integral image with zero row/col
    integ = np.zeros((h + 1, w + 1))
    integ[1:, 1:] = a.cumsum(0).cumsum(1)

    def _interp_rows(pos):
        # value of integral image at fractional row positions, all cols
        lo = np.clip(np.floor(pos).astype(int), 0, h)
        frac = pos - lo
        hi = np.clip(lo + 1, 0, h)
        return integ[lo] * (1 - frac)[:, None] + integ[hi] * frac[:, None]

    rows_interp = _interp_rows(ys)  # (rows+1, w+1)

    def _interp_cols(mat, pos):
        lo = np.clip(np.floor(pos).astype(int), 0, w)
        frac = pos - lo
        hi = np.clip(lo + 1, 0, w)
        return mat[:, lo] * (1 - frac)[None, :] + mat[:, hi] * frac[None, :]

    grid = _interp_cols(rows_interp, xs)  # (rows+1, cols+1)
    out = grid[1:, 1:] - grid[:-1, 1:] - grid[1:, :-1] + grid[:-1, :-1]
    area = np.outer(np.diff(ys), np.diff(xs))
    return out / np.maximum(area, 1e-9)
