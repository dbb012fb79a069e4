"""Writer/reader round-trip tests for the minimal PDF layer."""

import numpy as np
import pytest

from pdf_ocr_spark import fonts
from pdf_ocr_spark.minipdf import (
    ImagePage, MiniPdf, ScanLine, TextPage, TextSpan, build_pdf,
)


def _text_page(lines, width=306.0, height=396.0):
    spans = [
        TextSpan(x=20.0, y=height - 30.0 - 14.0 * i, size=12.0, text=t)
        for i, t in enumerate(lines)
    ]
    return TextPage(spans=spans, width=width, height=height)


def test_magic_and_page_count():
    data = build_pdf([_text_page(["hello world"]), _text_page(["page two"])])
    assert data.startswith(b"%PDF")
    pdf = MiniPdf(data)
    assert pdf.page_count == 2


def test_text_roundtrip_ordering():
    # spans written out of order must come back top-to-bottom, left-to-right
    page = TextPage(spans=[
        TextSpan(x=100.0, y=300.0, size=12.0, text="right"),
        TextSpan(x=20.0, y=300.0, size=12.0, text="left"),
        TextSpan(x=20.0, y=350.0, size=12.0, text="top"),
    ])
    pdf = MiniPdf(build_pdf([page]))
    assert pdf.extract_page_text(0) == "top\nleft right"


def test_text_escapes():
    pdf = MiniPdf(build_pdf([_text_page([r"a(b)c\d"])]))
    assert pdf.extract_page_text(0) == r"a(b)c\d"


def test_extract_all_pages_join():
    pdf = MiniPdf(build_pdf([_text_page(["one"]), _text_page(["two"])]))
    # reference join semantics: pages joined "\n\n" (pdf_detector.py:179)
    assert pdf.extract_text() == "one\n\ntwo"


def test_image_page_has_no_text_layer():
    page = ImagePage(lines=[ScanLine(x=20, y=30, size=12, text="SCAN")])
    pdf = MiniPdf(build_pdf([page]))
    assert pdf.extract_page_text(0) == ""
    img = pdf._pages[0]["image"]
    assert img is not None and img.dtype == np.uint8
    assert (img < 128).any()  # ink present


def test_render_image_page_scales_to_dpi():
    page = ImagePage(
        lines=[ScanLine(x=20, y=30, size=12, text="HELLO")],
        width=200.0, height=100.0,
    )
    pdf = MiniPdf(build_pdf([page]))
    img150 = pdf.render_page(0, dpi=150)
    assert img150.shape == (int(round(100 * 150 / 72)),
                            int(round(200 * 150 / 72)))
    assert (img150 < 128).any()


def test_render_text_page():
    pdf = MiniPdf(build_pdf([_text_page(["Hi"])]))
    img = pdf.render_page(0, dpi=150)
    assert (img < 128).any()


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        MiniPdf(b"JUNK not a pdf")


def test_determinism():
    pages = [
        _text_page(["alpha", "beta"]),
        ImagePage(lines=[ScanLine(x=10, y=20, size=12, text="Zed 9")],
                  skew_deg=2.0, noise=0.001),
    ]
    assert build_pdf(pages) == build_pdf(pages)


def test_font_glyphs_distinct_and_dense():
    seen = set()
    for ch, g in fonts.GLYPHS.items():
        assert g.shape == (7, 5)
        assert (g.sum(axis=0) >= 2).all(), ch
        assert g[0].any() and g[-1].any(), ch
        key = g.tobytes()
        assert key not in seen
        seen.add(key)
