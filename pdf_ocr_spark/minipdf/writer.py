"""Deterministic minimal PDF writer (fixture-generation only).

Produces structurally valid PDF 1.4: catalog, page tree, per-page content
streams, xref table, trailer. Two page flavors:

  * ``TextPage`` — a digital text layer: one ``Tm``+``Tj`` pair per text span,
    uncompressed. These exercise the reference's direct-extraction path
    (SmartPDF-OCR ``app/api/ocr.py:119-161``).
  * ``ImagePage`` — no text layer; a FlateDecode 8-bit grayscale image XObject
    whose pixels are the scan text drawn with the deterministic bitmap font
    (optionally skewed / salt-pepper noised). These exercise the
    render->preprocess->OCR path (``app/api/ocr.py:163-269``).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np

from .. import fonts


@dataclass
class TextSpan:
    x: float        # points from left
    y: float        # points from bottom (PDF coordinate system)
    size: float     # font size in points
    text: str


@dataclass
class TextPage:
    spans: list
    width: float = 306.0
    height: float = 396.0


@dataclass
class ScanLine:
    x: float        # points from left
    y: float        # points from top (image coordinate system)
    size: float     # nominal font size in points (glyph cell = 8 font px)
    text: str


@dataclass
class ImagePage:
    lines: list
    width: float = 306.0
    height: float = 396.0
    author_zoom: float = 3.0    # pixels per point when authoring the scan
    skew_deg: float = 0.0
    noise: float = 0.0          # salt-pepper fraction (deterministic)
    seed: int = 0


def _esc(s: str) -> bytes:
    """PDF literal-string bytes for ``s``, UTF-8 encoded.

    latin-1 with errors='replace' (the pre-review behavior) turned every
    CJK OCR line into '?' — the searchable layer was unsearchable for
    exactly the reference app's primary content. PDF strings are byte
    strings; UTF-8 keeps the content lossless and the paired reader
    decodes it back (a standards-exact CJK layer additionally needs an
    embedded CIDFont + ToUnicode CMap — outside this fixture-grade
    subset, documented limitation). Escaping the str FIRST is safe:
    multibyte UTF-8 units are >= 0x80, so '(' ')' '\\\\' only occur as
    ASCII."""
    out = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    return out.encode("utf-8")


def _render_scan(page: ImagePage) -> np.ndarray:
    az = page.author_zoom
    h = int(round(page.height * az))
    w = int(round(page.width * az))
    img = np.full((h, w), 255, dtype=np.uint8)
    for ln in page.lines:
        scale = max(1, int(round(ln.size * az / 8.0)))
        x = int(round(ln.x * az))
        y = int(round(ln.y * az))
        fonts.draw_text(img, x, y, ln.text, scale=scale, ink=0)
    if page.skew_deg:
        img = _rotate_nn(img, page.skew_deg)
    if page.noise > 0:
        img = _salt_pepper(img, page.noise, page.seed)
    return img


def _rotate_nn(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Nearest-neighbor rotation about the center, same canvas, white bg."""
    h, w = img.shape
    theta = np.deg2rad(angle_deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w]
    # inverse map: destination -> source
    ys = (yy - cy) * np.cos(theta) - (xx - cx) * np.sin(theta) + cy
    xs = (yy - cy) * np.sin(theta) + (xx - cx) * np.cos(theta) + cx
    ysi = np.rint(ys).astype(int)
    xsi = np.rint(xs).astype(int)
    valid = (ysi >= 0) & (ysi < h) & (xsi >= 0) & (xsi < w)
    out = np.full_like(img, 255)
    out[valid] = img[ysi[valid], xsi[valid]]
    return out


def _salt_pepper(img: np.ndarray, frac: float, seed: int) -> np.ndarray:
    n = img.size
    k = int(n * frac)
    if k <= 0:
        return img
    x = (seed * 2654435761 + 1) & 0xFFFFFFFFFFFFFFFF
    idx = np.empty(k, dtype=np.int64)
    val = np.empty(k, dtype=np.uint8)
    for i in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) \
            & 0xFFFFFFFFFFFFFFFF
        idx[i] = (x >> 33) % n
        val[i] = 0 if (x >> 17) & 1 else 255
    out = img.copy()
    out.flat[idx] = val
    return out


def build_pdf(pages: list) -> bytes:
    """Assemble a complete PDF from TextPage/ImagePage specs."""
    objects: list[bytes] = []  # 1-indexed bodies, object N = index N-1

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    page_obj_ids = []
    add(b"<< /Type /Catalog /Pages 2 0 R >>")          # obj 1
    pages_idx = add(b"PLACEHOLDER")                      # obj 2 (patched)

    for p in pages:
        if isinstance(p, TextPage):
            # per-span Tf: TextSpan.size was previously declared but
            # silently ignored (one hardcoded '/F1 12 Tf' per page) —
            # a loaded trap for fixture authors since ScanLine.size IS
            # honored (review)
            ops = [b"BT"]
            for sp in p.spans:
                ops.append(
                    b"/F1 %.2f Tf 1 0 0 1 %.2f %.2f Tm (%s) Tj"
                    % (sp.size, sp.x, sp.y, _esc(sp.text))
                )
            ops.append(b"ET")
            stream = b"\n".join(ops)
            content_id = add(
                b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(stream), stream)
            )
            page_id = add(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
                b"/Contents %d 0 R /Resources << /Font << /F1 << /Type /Font "
                b"/Subtype /Type1 /BaseFont /Helvetica >> >> >> >>"
                % (p.width, p.height, content_id)
            )
        elif isinstance(p, ImagePage):
            img = _render_scan(p)
            raw = zlib.compress(img.tobytes(), 6)
            img_id = add(
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
                % (img.shape[1], img.shape[0], len(raw), raw)
            )
            stream = b"q %.2f 0 0 %.2f 0 0 cm /Im0 Do Q" % (p.width, p.height)
            content_id = add(
                b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(stream), stream)
            )
            page_id = add(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
                b"/Contents %d 0 R /Resources << /XObject << /Im0 %d 0 R >> "
                b">> >>" % (p.width, p.height, content_id, img_id)
            )
        else:  # pragma: no cover
            raise TypeError(f"unknown page spec {type(p)}")
        page_obj_ids.append(page_id)

    kids = b" ".join(b"%d 0 R" % i for i in page_obj_ids)
    objects[pages_idx - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_obj_ids))
    )
    return assemble_pdf(objects)


def assemble_pdf(objects: list) -> bytes:
    """Serialize numbered object bodies (object N = objects[N-1], root =
    object 1) into a complete PDF with xref table + trailer. Shared by
    build_pdf and the searchable-PDF authoring (export_pdf.py)."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)
