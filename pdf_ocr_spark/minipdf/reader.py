"""Minimal PDF reader: page count, text-layer extraction, page rasterization.

Implements the subset of pdfplumber/PyMuPDF behavior the reference pipeline
uses (see package docstring). The reader is shared by the single-process
oracle and the Spark UDFs, so extraction semantics are identical on both
sides; what the equality tests exercise is everything *downstream* of it.

Text-extraction semantics (defining our analog of pdfplumber's layout mode,
used by SmartPDF-OCR ``app/core/pdf_detector.py:155-184``):
  * text spans sorted top-to-bottom (descending PDF y), then left-to-right,
  * spans sharing a baseline joined with a single space,
  * baselines joined with a newline,
  * ``extract_text(None)`` joins pages with "\\n\\n" (pdf_detector.py:179).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_OBJ_RX = re.compile(rb"(\d+)\s+0\s+obj")
# string content = escape pairs OR any char that is not an unescaped
# backslash/paren. The previous lazy-dot + (?<!\\) lookbehind could not
# terminate a string ending in an ESCAPED backslash ("(a\\\\)"): the
# closing paren is preceded by a backslash byte even though that
# backslash is itself escaped, so the match ran past the string end and
# leaked raw PDF operators into extracted text (code-review r3).
_TM_TJ_RX = re.compile(
    rb"1 0 0 1 ([\-0-9.]+) ([\-0-9.]+) Tm \(((?:\\.|[^\\)])*)\) Tj", re.S
)
_MEDIABOX_RX = re.compile(rb"/MediaBox \[0 0 ([\-0-9.]+) ([\-0-9.]+)\]")
# render-time scan: font-size state changes OR text-showing ops, in
# content-stream order (group 1 = Tf size; groups 2-4 = Tm/Tj)
_TF_OR_TM_TJ_RX = re.compile(
    rb"/F1 ([\-0-9.]+) Tf|"
    rb"1 0 0 1 ([\-0-9.]+) ([\-0-9.]+) Tm \(((?:\\.|[^\\)])*)\) Tj", re.S
)
_LENGTH_RX = re.compile(rb"/Length (\d+)")


def _unesc(b: bytes) -> str:
    raw = (
        b.replace(b"\\(", b"(").replace(b"\\)", b")").replace(b"\\\\", b"\\")
    )
    # the paired writer emits UTF-8 (lossless CJK — review); latin-1 is
    # the fallback for strings written by other tools (it never fails,
    # every byte maps)
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


class MiniPdf:
    """Parsed minimal PDF. Raises ValueError on anything unparseable."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF"):
            raise ValueError("not a PDF: missing %PDF magic")
        self._objs: dict[int, tuple[bytes, bytes | None]] = {}
        # honor the documented contract for ANY malformed subset PDF:
        # missing /Kids object ids (KeyError), absent /Width
        # (AttributeError on None.group), corrupt FlateDecode
        # (zlib.error) all surfaced raw before (review), bypassing
        # callers' narrow `except ValueError` decode handling
        try:
            self._parse_objects(data)
            self._pages = self._collect_pages()
        except ValueError:
            raise
        except Exception as e:
            raise ValueError(
                f"malformed pdf: {type(e).__name__}: {e}") from None

    # -- structure -----------------------------------------------------
    def _parse_objects(self, data: bytes) -> None:
        pos = 0
        n = len(data)
        while True:
            m = _OBJ_RX.search(data, pos)
            if not m:
                break
            obj_id = int(m.group(1))
            cur = m.end()
            # balanced dict scan
            if data[cur:cur + 10].lstrip()[:2] != b"<<":
                pos = cur
                continue
            start = data.index(b"<<", cur)
            depth = 0
            i = start
            while i < n:
                if data[i:i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif data[i:i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        break
                else:
                    i += 1
            head = data[start:i]
            stream = None
            rest = data[i:i + 20]
            if rest.lstrip().startswith(b"stream"):
                lm = _LENGTH_RX.search(head)
                if not lm:
                    raise ValueError("stream without /Length")
                length = int(lm.group(1))
                s_at = data.index(b"stream", i) + len(b"stream")
                if data[s_at:s_at + 2] == b"\r\n":
                    s_at += 2
                elif data[s_at:s_at + 1] == b"\n":
                    s_at += 1
                stream = data[s_at:s_at + length]
                i = s_at + length
            self._objs[obj_id] = (head, stream)
            e = data.find(b"endobj", i)
            pos = e + 6 if e >= 0 else i

    def _collect_pages(self) -> list[dict]:
        pages_obj = None
        for head, _ in self._objs.values():
            if b"/Type /Pages" in head:
                pages_obj = head
                break
        if pages_obj is None:
            raise ValueError("no /Pages object")
        kids = re.search(rb"/Kids \[(.*?)\]", pages_obj, re.S)
        if not kids:
            raise ValueError("no /Kids")
        ids = [int(x) for x in re.findall(rb"(\d+) 0 R", kids.group(1))]
        pages = []
        for pid in ids:
            head, _ = self._objs[pid]
            mb = _MEDIABOX_RX.search(head)
            width, height = (float(mb.group(1)), float(mb.group(2))) if mb \
                else (612.0, 792.0)
            cm = re.search(rb"/Contents (\d+) 0 R", head)
            content = self._objs[int(cm.group(1))][1] if cm else b""
            im = re.search(rb"/Im0 (\d+) 0 R", head)
            image = None
            if im:
                ihead, istream = self._objs[int(im.group(1))]
                iw = int(re.search(rb"/Width (\d+)", ihead).group(1))
                ih = int(re.search(rb"/Height (\d+)", ihead).group(1))
                raw = zlib.decompress(istream) if b"/FlateDecode" in ihead \
                    else istream
                image = np.frombuffer(raw, dtype=np.uint8).reshape(ih, iw)
            pages.append(
                {"width": width, "height": height, "content": content or b"",
                 "image": image}
            )
        return pages

    # -- public API ------------------------------------------------------
    @property
    def page_count(self) -> int:
        return len(self._pages)

    def page_size(self, page_num: int) -> tuple[float, float]:
        p = self._pages[page_num]
        return p["width"], p["height"]

    def extract_page_text(self, page_num: int) -> str:
        """Text layer of one page ('' when none)."""
        p = self._pages[page_num]
        spans = []
        for m in _TM_TJ_RX.finditer(p["content"]):
            x, y = float(m.group(1)), float(m.group(2))
            spans.append((-y, x, _unesc(m.group(3))))
        if not spans:
            return ""
        spans.sort(key=lambda t: (t[0], t[1]))
        lines: list[list[str]] = []
        last_y = None
        for ny, _x, txt in spans:
            if last_y is None or ny != last_y:
                lines.append([txt])
                last_y = ny
            else:
                lines[-1].append(txt)
        return "\n".join(" ".join(parts) for parts in lines)

    def extract_text(self, page_num: int | None = None) -> str:
        """Mirror of reference extract_text (pdf_detector.py:155-184)."""
        if page_num is not None:
            if page_num >= self.page_count:
                raise ValueError(f"page {page_num} out of range")
            return self.extract_page_text(page_num)
        return "\n\n".join(
            self.extract_page_text(i) for i in range(self.page_count)
        )

    def render_page(self, page_num: int, dpi: int) -> np.ndarray:
        """Rasterize a page to uint8 grayscale at dpi (zoom = dpi/72).

        Mirrors the reference renderer's geometry
        (app/core/pdf_renderer.py:45-95): canvas = page points * zoom. Image
        XObjects are nearest-neighbor scaled onto the full page (our writer
        always places /Im0 across the full MediaBox); text spans are drawn
        with the deterministic font so text pages are raster-able too.
        """
        from .. import fonts

        p = self._pages[page_num]
        zoom = dpi / 72.0
        h = int(round(p["height"] * zoom))
        w = int(round(p["width"] * zoom))
        if p["image"] is not None:
            src = p["image"]
            ys = np.minimum(
                (np.arange(h) * (src.shape[0] / h)).astype(int),
                src.shape[0] - 1,
            )
            xs = np.minimum(
                (np.arange(w) * (src.shape[1] / w)).astype(int),
                src.shape[1] - 1,
            )
            return src[np.ix_(ys, xs)].copy()
        canvas = np.full((h, w), 255, dtype=np.uint8)
        # sequential scan honoring /F1 <size> Tf state (the writer now
        # emits one per span; default 12.0 covers pre-review PDFs whose
        # single page-level Tf this regex also picks up)
        size = 12.0
        for m in _TF_OR_TM_TJ_RX.finditer(p["content"]):
            if m.group(1) is not None:
                size = float(m.group(1))
                continue
            x, y = float(m.group(2)), float(m.group(3))
            txt = _unesc(m.group(4))
            scale = max(1, int(round(size * zoom / 8.0)))
            top = int(round((p["height"] - y - size) * zoom))
            fonts.draw_text(canvas, int(round(x * zoom)), top, txt, scale)
        return canvas
