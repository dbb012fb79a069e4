"""Real-world PDF reader adapters: mount pdfplumber / PyMuPDF into the
``MiniPdf`` reader slot.

``MiniPdf`` (reader.py) parses only the engine's own deterministic PDF
subset; a PDF produced by a real-world tool routes to an error row. These
adapters implement the same reader contract — ``page_count`` /
``page_size`` / ``extract_page_text`` / ``extract_text`` /
``render_page`` — over the libraries the reference uses, mirroring its
exact call shapes:

- text layer via pdfplumber ``page.extract_text() or ""`` with pages
  joined by "\\n\\n" and the out-of-range ValueError
  (SmartPDF-OCR ``app/core/pdf_detector.py:155-184``);
- rasterization via PyMuPDF ``page.get_pixmap(matrix=fitz.Matrix(zoom,
  zoom))`` with ``zoom = dpi / 72`` and RGBA->RGB stripping
  (``app/core/pdf_renderer.py:45-95``) — plus a grayscale conversion
  (ITU-R 601 luma), because this engine's preprocess/OCR kernels consume
  2-D uint8 grayscale.

Neither library is installed in this sandbox, so imports are guarded the
same way as ``ocr.paddle_adapter``: constructing an adapter without the
library raises a clear ImportError unless a ready document object is
injected (``doc_impl`` / ``pdf_impl`` — how the interface-contract tests
drive the adapters with reference-shaped fakes). Backend selection
follows ``ocr.engine.get_engine``: ``open_pdf(data, backend=...)`` or the
``SPARK_GRAFT_PDF_BACKEND`` env var, which executors inherit through
``spark.executorEnv.*``. Unlike the OCR engine (a per-process singleton),
a reader is per-document — no caching; per-worker amortization lives in
the library itself.
"""

from __future__ import annotations

import io

import numpy as np

from .reader import MiniPdf

try:  # pragma: no cover - PyMuPDF not in this sandbox
    import fitz as _fitz
except ImportError:
    _fitz = None

try:  # pragma: no cover - pdfplumber not in this sandbox
    import pdfplumber as _pdfplumber
except ImportError:
    _pdfplumber = None

_LUMA = np.array([0.299, 0.587, 0.114])  # ITU-R 601


class PyMuPdfReader:
    """Full reader-contract adapter over PyMuPDF (text + raster).

    ``doc_impl`` injects a ready fitz-like document (tests, or a
    pre-opened ``fitz.Document``): it must expose ``page_count`` and
    ``load_page(i)`` -> page with ``.rect`` (``width``/``height``),
    ``.get_text("text")`` and ``.get_pixmap(matrix=...)`` -> pixmap with
    ``samples`` / ``width`` / ``height`` / ``n``. Without fitz the
    matrix argument degrades to a ``(zoom, zoom)`` tuple so injected
    fakes can assert the scale factor."""

    def __init__(self, data: bytes | None = None, doc_impl=None):
        if doc_impl is not None:
            self._doc = doc_impl
        else:
            if _fitz is None:
                raise ImportError(
                    "PyMuPDF (fitz) is not installed; install pymupdf on "
                    "the executors or inject doc_impl")
            self._doc = _fitz.open(stream=data, filetype="pdf")

    @property
    def page_count(self) -> int:
        return int(self._doc.page_count)

    def page_size(self, page_num: int) -> tuple[float, float]:
        r = self._doc.load_page(page_num).rect
        return float(r.width), float(r.height)

    def extract_page_text(self, page_num: int) -> str:
        # fitz get_text("text") appends a trailing newline per block; the
        # reference's pdfplumber extract_text does not — strip the tail so
        # page joins stay "\n\n", not "\n\n\n"
        return (self._doc.load_page(page_num).get_text("text") or "") \
            .rstrip("\n")

    def extract_text(self, page_num: int | None = None) -> str:
        """Pinned join semantics (pdf_detector.py:155-184): explicit
        out-of-range error for a single page, pages joined "\\n\\n"."""
        if page_num is not None:
            if page_num >= self.page_count:
                raise ValueError(f"page {page_num} out of range")
            return self.extract_page_text(page_num)
        return "\n\n".join(
            self.extract_page_text(i) for i in range(self.page_count))

    def render_page(self, page_num: int, dpi: int) -> np.ndarray:
        """Reference render geometry (pdf_renderer.py:45-95): zoom =
        dpi/72, Matrix(zoom, zoom) pixmap, RGBA -> RGB; then grayscale
        (luma) because downstream kernels take 2-D uint8."""
        if page_num >= self.page_count:
            raise ValueError(f"page {page_num} out of range")
        zoom = dpi / 72.0
        mat = _fitz.Matrix(zoom, zoom) if _fitz is not None \
            else (zoom, zoom)
        pix = self._doc.load_page(page_num).get_pixmap(matrix=mat)
        img = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
            pix.height, pix.width, pix.n)
        if pix.n == 4:
            img = img[:, :, :3]
        if img.shape[2] == 1:
            return img[:, :, 0].copy()
        return (img.astype(np.float64) @ _LUMA).round().astype(np.uint8)


class PdfPlumberReader:
    """Text-layer reader-contract adapter over pdfplumber.

    Mirrors the reference's division of labor: pdfplumber does detection
    and text extraction (pdf_detector.py:155-184); rasterization belongs
    to PyMuPDF (pdf_renderer.py) — ``render_page`` here raises with a
    pointer to the ``pymupdf`` backend rather than pretending.

    ``pdf_impl`` injects a ready pdfplumber-like object exposing
    ``.pages`` -> sequence of pages with ``.width`` / ``.height`` /
    ``.extract_text()``."""

    def __init__(self, data: bytes | None = None, pdf_impl=None):
        if pdf_impl is not None:
            self._pdf = pdf_impl
        else:
            if _pdfplumber is None:
                raise ImportError(
                    "pdfplumber is not installed; install pdfplumber on "
                    "the executors or inject pdf_impl")
            self._pdf = _pdfplumber.open(io.BytesIO(data))

    @property
    def page_count(self) -> int:
        return len(self._pdf.pages)

    def page_size(self, page_num: int) -> tuple[float, float]:
        p = self._pdf.pages[page_num]
        return float(p.width), float(p.height)

    def extract_page_text(self, page_num: int) -> str:
        # exact reference call shape: extract_text() or ""
        return self._pdf.pages[page_num].extract_text() or ""

    def extract_text(self, page_num: int | None = None) -> str:
        if page_num is not None:
            if page_num >= self.page_count:
                raise ValueError(f"page {page_num} out of range")
            return self.extract_page_text(page_num)
        return "\n\n".join(
            self.extract_page_text(i) for i in range(self.page_count))

    def render_page(self, page_num: int, dpi: int) -> np.ndarray:
        raise NotImplementedError(
            "pdfplumber backend is text-layer only (the reference "
            "rasterizes with PyMuPDF, app/core/pdf_renderer.py); use "
            "backend='pymupdf' for image-PDF pipelines")


_BACKENDS = {
    "mini": MiniPdf,
    "pymupdf": PyMuPdfReader,
    "pdfplumber": PdfPlumberReader,
}


def open_pdf(data: bytes, backend: str | None = None):
    """Open decoded PDF bytes with the selected reader backend.

    ``backend``: ``mini`` (default — the deterministic subset reader) |
    ``pymupdf`` | ``pdfplumber``; falls back to the
    ``SPARK_GRAFT_PDF_BACKEND`` env var. Raises ValueError for unknown
    backends and whatever the reader raises for unparseable input (the
    pipeline contains those per document as error rows)."""
    import os
    resolved = backend or os.environ.get("SPARK_GRAFT_PDF_BACKEND", "mini")
    cls = _BACKENDS.get(resolved)
    if cls is None:
        raise ValueError(f"unknown PDF backend: {resolved}")
    return cls(data)
