"""Reader-contract tests for the real-world PDF adapters (VERDICT r2 #1).

Mirrors test_paddle_adapter's strategy: the adapters' parsing/geometry
logic is driven with reference-shaped fake backend objects (fitz-like /
pdfplumber-like), the real libraries are exercised only when installed
(skipped-if-unavailable), and the dispatch/guard behavior is pinned."""

import numpy as np
import pytest

from pdf_ocr_spark.detector import detect_pdf
from pdf_ocr_spark.minipdf import (
    MiniPdf, PdfPlumberReader, PyMuPdfReader, build_pdf, open_pdf,
)
from pdf_ocr_spark.minipdf.writer import TextPage, TextSpan


# --- fitz-shaped fakes ------------------------------------------------------
class _FakeRect:
    def __init__(self, w, h):
        self.width, self.height = w, h


class _FakePixmap:
    """Reference parse shape (pdf_renderer.py:72-81): samples/width/
    height/n."""

    def __init__(self, arr):
        self.height, self.width = arr.shape[:2]
        self.n = arr.shape[2]
        self.samples = arr.tobytes()


class _FakePage:
    def __init__(self, text, w=612.0, h=792.0, channels=3):
        self._text = text
        self.rect = _FakeRect(w, h)
        self._channels = channels
        self.last_matrix = None

    def get_text(self, kind):
        assert kind == "text"
        return self._text

    def get_pixmap(self, matrix):
        self.last_matrix = matrix  # (zoom, zoom) tuple without fitz
        zoom = matrix[0]
        h = int(round(self.rect.height * zoom))
        w = int(round(self.rect.width * zoom))
        arr = np.zeros((h, w, self._channels), dtype=np.uint8)
        arr[..., 0] = 200  # red-ish so luma conversion is observable
        if self._channels == 4:
            arr[..., 3] = 255
        return _FakePixmap(arr)


class _FakeFitzDoc:
    def __init__(self, pages):
        self._pages = pages
        self.page_count = len(pages)

    def load_page(self, i):
        return self._pages[i]


# --- pdfplumber-shaped fakes ------------------------------------------------
class _FakePlumberPage:
    def __init__(self, text, w=612.0, h=792.0):
        self._text, self.width, self.height = text, w, h

    def extract_text(self):
        return self._text


class _FakePlumberPdf:
    def __init__(self, pages):
        self.pages = pages


def test_pymupdf_adapter_contract_with_fake_backend():
    doc = _FakeFitzDoc([
        _FakePage("Hello\nWorld\n"),   # fitz-style trailing newline
        _FakePage(""),                 # empty text layer
    ])
    r = PyMuPdfReader(doc_impl=doc)
    assert r.page_count == 2
    assert r.page_size(0) == (612.0, 792.0)
    # trailing newline stripped so the "\n\n" page join is not inflated
    assert r.extract_page_text(0) == "Hello\nWorld"
    assert r.extract_text(0) == "Hello\nWorld"
    assert r.extract_text() == "Hello\nWorld\n\n"
    with pytest.raises(ValueError, match="out of range"):
        r.extract_text(2)


def test_pymupdf_adapter_render_geometry_and_grayscale():
    page = _FakePage("x", w=100.0, h=50.0, channels=3)
    r = PyMuPdfReader(doc_impl=_FakeFitzDoc([page]))
    img = r.render_page(0, dpi=144)  # zoom = 2
    assert page.last_matrix == (2.0, 2.0)
    assert img.shape == (100, 200) and img.dtype == np.uint8
    # luma of (200, 0, 0) = 0.299 * 200 = 59.8 -> 60
    assert int(img[0, 0]) == 60
    with pytest.raises(ValueError, match="out of range"):
        r.render_page(1, dpi=144)


def test_pymupdf_adapter_rgba_stripped_like_reference():
    page = _FakePage("x", w=10.0, h=10.0, channels=4)
    r = PyMuPdfReader(doc_impl=_FakeFitzDoc([page]))
    img = r.render_page(0, dpi=72)
    assert img.shape == (10, 10)  # alpha dropped before luma


def test_pdfplumber_adapter_contract_with_fake_backend():
    pdf = _FakePlumberPdf([
        _FakePlumberPage("page one text"),
        _FakePlumberPage(None),  # pdfplumber returns None for no layer
    ])
    r = PdfPlumberReader(pdf_impl=pdf)
    assert r.page_count == 2
    assert r.page_size(1) == (612.0, 792.0)
    assert r.extract_page_text(1) == ""  # "or ''" — the reference quirk
    assert r.extract_text() == "page one text\n\n"
    with pytest.raises(ValueError, match="out of range"):
        r.extract_text(5)
    with pytest.raises(NotImplementedError, match="pymupdf"):
        r.render_page(0, dpi=300)


def test_adapter_slots_into_detector():
    """The detector is duck-typed on the reader contract: a fake-backed
    adapter must drive detect_pdf exactly like MiniPdf does."""
    long_text = " ".join(["word"] * 30)  # > 50 chars -> text page
    doc = _FakeFitzDoc([_FakePage(long_text + "\n"), _FakePage("")])
    info = detect_pdf(PyMuPdfReader(doc_impl=doc))
    assert info.page_count == 2
    assert info.pdf_type == "mixed"
    assert info.text_pages == [0] and info.image_pages == [1]


def test_open_pdf_dispatch_and_guards(monkeypatch):
    data = build_pdf([TextPage(spans=[TextSpan(72, 720, 12.0, "Hi there")])])
    assert isinstance(open_pdf(data), MiniPdf)  # default backend
    assert isinstance(open_pdf(data, backend="mini"), MiniPdf)
    with pytest.raises(ValueError, match="unknown PDF backend"):
        open_pdf(data, backend="nope")
    # env-var selection, same mechanism as SPARK_GRAFT_OCR_BACKEND
    monkeypatch.setenv("SPARK_GRAFT_PDF_BACKEND", "nope")
    with pytest.raises(ValueError, match="unknown PDF backend"):
        open_pdf(data)
    monkeypatch.delenv("SPARK_GRAFT_PDF_BACKEND")
    # real libraries absent in this sandbox -> clear ImportError
    try:
        import fitz  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="pymupdf|PyMuPDF"):
            open_pdf(data, backend="pymupdf")
    try:
        import pdfplumber  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="pdfplumber"):
            open_pdf(data, backend="pdfplumber")


def test_pipeline_contains_unavailable_backend_as_error_rows():
    """cfg.pdf_backend wires through extract: with pymupdf missing, PDF
    payloads become contained error rows (C6), never task failures."""
    import pandas as pd
    from pdf_ocr_spark.config import EngineConfig
    from pdf_ocr_spark.extract import extract_batch
    from pdf_ocr_spark.fixtures import _pdf_payload
    import random
    try:
        import fitz  # noqa: F401
        pytest.skip("pymupdf installed; containment path not reachable")
    except ImportError:
        pass
    cfg = EngineConfig(pdf_backend="pymupdf")
    res = extract_batch(
        pd.Series([_pdf_payload(random.Random(1), "text"), "plain text"]),
        cfg)
    assert res["method"].tolist() == ["error", "plain"]
    assert "ImportError" in res["error"][0]


# --- real-backend contract runs (skipped in this sandbox) -------------------
def test_real_pymupdf_reads_minipdf_fixture():
    fitz = pytest.importorskip("fitz")
    assert fitz is not None
    data = build_pdf([
        TextPage(spans=[TextSpan(72, 720, 12.0, "Alpha"),
                        TextSpan(72, 700, 12.0, "Beta")]),
    ])
    r = PyMuPdfReader(data)
    assert r.page_count == MiniPdf(data).page_count
    assert "Alpha" in r.extract_text()
    img = r.render_page(0, dpi=150)
    assert img.ndim == 2 and img.dtype == np.uint8


def test_real_pdfplumber_reads_minipdf_fixture():
    pytest.importorskip("pdfplumber")
    data = build_pdf([
        TextPage(spans=[TextSpan(72, 720, 12.0, "Gamma")]),
    ])
    r = PdfPlumberReader(data)
    assert r.page_count == 1
    assert "Gamma" in r.extract_text()
