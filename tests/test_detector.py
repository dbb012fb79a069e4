"""Payload-kind routing and PDF type detection (incl. sampling arithmetic)."""

import base64

from pdf_ocr_spark.detector import (
    KIND_HTML, KIND_PDF, KIND_PLAIN, decode_pdf_payload, detect_payload_kind,
    detect_pdf,
)
from pdf_ocr_spark.minipdf import (
    ImagePage, MiniPdf, ScanLine, TextPage, TextSpan, build_pdf,
)


def _text_page(text_lines, chars_pad=0):
    spans = []
    for i, t in enumerate(text_lines):
        spans.append(TextSpan(x=20.0, y=360.0 - 14 * i, size=12.0, text=t))
    return TextPage(spans=spans)


def _long_text_page():
    # >= 50 chars => text page at the reference threshold
    return _text_page(["x" * 60])


def _short_text_page():
    return _text_page(["tiny"])


def _image_page(text="SCAN"):
    return ImagePage(lines=[ScanLine(x=20, y=40, size=12, text=text)])


def _b64(pages):
    return base64.b64encode(build_pdf(pages)).decode()


def test_payload_kind_pdf_prefix():
    assert detect_payload_kind(_b64([_long_text_page()])) == KIND_PDF


def test_payload_kind_html():
    assert detect_payload_kind("<!DOCTYPE html><html>...") == KIND_HTML
    assert detect_payload_kind("  <html lang='en'>") == KIND_HTML
    assert detect_payload_kind("<HTML>") == KIND_HTML


def test_payload_kind_plain():
    assert detect_payload_kind("just some chat text") == KIND_PLAIN
    assert detect_payload_kind("<p>fragment without html root</p>") \
        == KIND_PLAIN


def test_decode_validates_magic():
    import pytest
    with pytest.raises(ValueError):
        decode_pdf_payload(base64.b64encode(b"NOTPDF").decode())


def test_detect_all_text():
    pdf = MiniPdf(build_pdf([_long_text_page(), _long_text_page()]))
    info = detect_pdf(pdf)
    assert info.pdf_type == "text"
    assert info.text_pages == [0, 1]
    assert info.image_pages == []
    assert info.total_text_chars == 120
    assert info.avg_chars_per_page == 60.0


def test_detect_all_image():
    pdf = MiniPdf(build_pdf([_image_page(), _image_page()]))
    info = detect_pdf(pdf)
    assert info.pdf_type == "image"
    assert info.image_pages == [0, 1]


def test_detect_mixed_and_short_text_is_image():
    # a page with a text layer under 50 chars counts as an image page
    pdf = MiniPdf(build_pdf([_long_text_page(), _short_text_page(),
                             _image_page()]))
    info = detect_pdf(pdf)
    assert info.pdf_type == "mixed"
    assert info.text_pages == [0]
    assert info.image_pages == [1, 2]


def test_sampled_detection_all_text():
    # 60 pages > 50 => sampling; all text => extrapolate to every page
    pdf = MiniPdf(build_pdf([_long_text_page() for _ in range(60)]))
    info = detect_pdf(pdf)
    assert info.pdf_type == "text"
    assert info.text_pages == list(range(60))
    # sample = head 15 + mid 15 + tail 15 = 45 distinct pages; totals are
    # sampled-only (reference pdf_detector.py:104)
    assert info.total_text_chars == 45 * 60
    assert info.avg_chars_per_page == 60.0


def test_sampled_detection_mixed_keeps_sampled_indices_only():
    # image pages only outside the middle sample; head sampled text
    pages = []
    for i in range(60):
        pages.append(_long_text_page() if i < 30 else _image_page())
    pdf = MiniPdf(build_pdf(pages))
    info = detect_pdf(pdf)
    assert info.pdf_type == "mixed"
    # sampled indices: 0-14, 23-37, 45-59 — text among sampled are 0-14 and
    # 23-29; image among sampled are 30-37 and 45-59
    assert info.text_pages == list(range(15)) + list(range(23, 30))
    assert info.image_pages == list(range(30, 38)) + list(range(45, 60))
