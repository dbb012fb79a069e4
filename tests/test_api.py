"""Task-level API semantics (page selection, options, result shape)."""

import pytest

from pdf_ocr_spark.api import normalize_pages, process_pdf_bytes
from pdf_ocr_spark.minipdf import (
    ImagePage, ScanLine, TextPage, TextSpan, build_pdf,
)


def _text_page(text):
    return TextPage(spans=[TextSpan(x=20, y=350, size=12, text=text)])


def test_normalize_pages_reference_semantics():
    # api/ocr.py:59-65: 1-based, sorted(set(...)), 0-based out
    assert normalize_pages(None, 3) == [0, 1, 2]
    assert normalize_pages([3, 1, 3], 3) == [0, 2]
    with pytest.raises(ValueError):
        normalize_pages([0], 3)
    with pytest.raises(ValueError):
        normalize_pages([4], 3)


def test_process_text_pdf_page_selection():
    data = build_pdf([_text_page("page one " + "a" * 50),
                      _text_page("page two " + "b" * 50),
                      _text_page("page three " + "c" * 50)])
    out = process_pdf_bytes(data, pages=[3, 1])
    assert out["type"] == "text"
    assert [r["page"] for r in out["pages"]] == [0, 2]
    assert out["combined"].startswith("page one")
    assert "page three" in out["combined"]
    assert "page two" not in out["combined"]


def test_process_scan_pdf_result_shape():
    data = build_pdf([ImagePage(lines=[
        ScanLine(x=20, y=40, size=12, text="Scanned Text")])])
    out = process_pdf_bytes(data)
    assert out["type"] == "ocr"
    row = out["pages"][0]
    assert row["method"] == "ocr"
    assert row["text"] == "Scanned Text"
    assert row["paragraphs"] == ["Scanned Text"]
    assert 0 < row["confidence"] <= 1.0


def test_margin_options_kill_page_number():
    # NOTE: the margin filter runs BEFORE same-row merge
    # (postprocess.py:88-92), and this engine emits word-level lines, so
    # the page-number kill applies per word ("42" matches; a detached "-"
    # would survive). Use a bare number like most scanned page footers.
    page = ImagePage(lines=[
        ScanLine(x=20, y=40, size=12, text="Body content"),
        ScanLine(x=150, y=380, size=12, text="42"),
    ])
    out = process_pdf_bytes(build_pdf([page]), ignore_top=1.0)
    assert out["pages"][0]["text"] == "Body content"
    out2 = process_pdf_bytes(build_pdf([page]))
    assert "42" in out2["pages"][0]["text"]  # filter off => kept


def test_process_pdf_bytes_ocr_path_has_combined():
    """The documented contract promises 'combined' on EVERY path; the
    ocr path omitted it (review r4)."""
    from pdf_ocr_spark.api import process_pdf_bytes
    from pdf_ocr_spark.minipdf.writer import (
        ImagePage, ScanLine, build_pdf)
    blob = build_pdf([ImagePage(lines=[
        ScanLine(x=20, y=40, size=12, text="hello ocr world")])])
    out = process_pdf_bytes(blob)
    assert out["type"] == "ocr"
    assert "combined" in out
    assert out["combined"] == "\n\n".join(
        r["text"] for r in out["pages"])
    assert out["combined"].strip()
