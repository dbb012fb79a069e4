"""S10/S11 binary authoring tests: the stdlib OOXML writer and the
from-scratch searchable-PDF writer, both consuming the quirk-pinned
docx_model layer."""

import io
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from pdf_ocr_spark.docx_model import parse_markdown_blocks
from pdf_ocr_spark.export_docx import (
    docx_bytes, docx_confidence_bytes, with_docx_export,
)
from pdf_ocr_spark.export_pdf import searchable_pdf_bytes, \
    with_searchable_pdf
from pdf_ocr_spark.minipdf import MiniPdf

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

_MD = ("## Section Title\n"
       "Intro with **bold core** inside.\n"
       "- first bullet\n"
       "1. numbered item\n"
       "plain tail")


def _doc_xml(blob: bytes):
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels",
                "word/document.xml", "word/styles.xml",
                "word/_rels/document.xml.rels"} <= names
        return ET.fromstring(z.read("word/document.xml"))


def test_docx_package_structure_and_blocks():
    blocks = parse_markdown_blocks([_MD])
    root = _doc_xml(docx_bytes([blocks], title="Doc T"))
    body = root.find(f"{_W}body")
    ps = body.findall(f"{_W}p")
    styles = [
        (p.find(f"{_W}pPr/{_W}pStyle").get(f"{_W}val")
         if p.find(f"{_W}pPr/{_W}pStyle") is not None else None)
        for p in ps]
    assert styles == ["Title", "Heading2", None, "ListBullet",
                      "ListNumber", None]
    # title centered (docx_export.py:101-104)
    assert ps[0].find(f"{_W}pPr/{_W}jc").get(f"{_W}val") == "center"
    # bold run split: middle run of the intro paragraph is bold
    intro_runs = ps[2].findall(f"{_W}r")
    bolds = [r.find(f"{_W}rPr/{_W}b") is not None for r in intro_runs]
    texts = [r.find(f"{_W}t").text or "" for r in intro_runs]
    assert "bold core" in texts and bolds[texts.index("bold core")]
    assert not bolds[0]
    # every run carries ascii + eastAsia font and half-point size
    r0 = intro_runs[0].find(f"{_W}rPr/{_W}rFonts")
    assert r0.get(f"{_W}ascii") == "宋体"
    assert r0.get(f"{_W}eastAsia") == "宋体"  # docx_export.py:168-173
    assert intro_runs[0].find(f"{_W}rPr/{_W}sz").get(f"{_W}val") == "24"
    # page setup: A4 cm -> twips with 2.54 cm margins (docx_export.py:91-99)
    sect = body.find(f"{_W}sectPr")
    assert sect.find(f"{_W}pgSz").get(f"{_W}w") == "11907"
    assert sect.find(f"{_W}pgSz").get(f"{_W}h") == "16839"
    assert sect.find(f"{_W}pgMar").get(f"{_W}top") == "1440"


def test_docx_page_breaks_between_pages_only():
    b1 = parse_markdown_blocks(["one"])
    b2 = parse_markdown_blocks(["two"])
    root = _doc_xml(docx_bytes([b1, b2]))
    breaks = root.findall(f".//{_W}br")
    assert len(breaks) == 1  # docx_export.py:85-87: never after the last
    assert breaks[0].get(f"{_W}type") == "page"


def test_docx_confidence_red_runs():
    root = _doc_xml(docx_confidence_bytes(
        [("good paragraph", 0.9), ("shaky paragraph", 0.3)]))
    ps = root.find(f"{_W}body").findall(f"{_W}p")
    colors = [p.find(f"{_W}r/{_W}rPr/{_W}color") for p in ps]
    assert colors[0] is None
    assert colors[1].get(f"{_W}val") == "FF0000"  # docx_export.py:205-209


def test_searchable_pdf_round_trips_through_minipdf():
    img = np.full((200, 300), 255, dtype=np.uint8)
    img[40:56, 30:120] = 0
    lines = [("HELLO WORLD", 30.0, 40.0, 16.0),
             ("second line", 30.0, 120.0, 16.0)]
    blob = searchable_pdf_bytes([img], [lines], dpi=72)
    assert blob.startswith(b"%PDF")
    pdf = MiniPdf(blob)
    assert pdf.page_count == 1
    # searchable: the invisible text layer is readable, in top-down order
    text = pdf.extract_page_text(0)
    assert text.splitlines() == ["HELLO WORLD", "second line"]
    # visual: the scan image is intact at the authoring dpi (zoom 1)
    rendered = pdf.render_page(0, dpi=72)
    assert rendered.shape == (200, 300)
    assert (rendered == img).all()
    # invisible-text render mode present (searchable_pdf.py:96-103)
    assert b"3 Tr" in blob


def test_searchable_pdf_font_floor_quirk_in_stream():
    """overlay_spec's reference quirk (searchable_pdf.py:90-92): a line
    whose scaled height is under 1pt jumps to font size 8."""
    img = np.full((50, 50), 255, dtype=np.uint8)
    blob = searchable_pdf_bytes(
        [img], [[("tiny", 5.0, 5.0, 3.0)]], dpi=300)  # 3px*0.24*0.8 < 1
    assert b"/F1 8.00 Tf" in blob


def test_searchable_pdf_y_flip_geometry():
    """Model y_baseline is top-down (fitz convention); the content stream
    must be y-up: a line at the image top lands near page_height."""
    img = np.full((100, 100), 255, dtype=np.uint8)
    blob = searchable_pdf_bytes(
        [img], [[("top", 0.0, 0.0, 20.0)]], dpi=72)
    # page 100pt tall; font = 20*0.8 = 16; baseline = 0+16 -> y = 84
    assert b"1 0 0 1 0.00 84.00 Tm" in blob


def test_with_docx_export_stage(spark):
    df = spark.createDataFrame(
        [("c1", 0, "# Head\n\nbody text"), ("c1", 1, None)],
        "conv_id string, turn_idx int, extracted_text string")
    rows = {r["turn_idx"]: r for r in with_docx_export(df).collect()}
    assert set(rows) == {0, 1}
    root = _doc_xml(bytes(rows[0]["docx"]))
    texts = [t.text for t in root.iter(f"{_W}t")]
    assert "Head" in texts and "body text" in texts
    # NULL text still authors a (title-only) document, no crash
    assert bytes(rows[1]["docx"]).startswith(b"PK")


def test_with_searchable_pdf_stage(spark):
    import base64
    from pdf_ocr_spark.minipdf import ImagePage, ScanLine, build_pdf
    scan = build_pdf([ImagePage(lines=[
        ScanLine(20, 40, 14, "SCANNED TEXT")])])
    payload = base64.b64encode(scan).decode()
    df = spark.createDataFrame(
        [("c1", 0, payload), ("c1", 1, "not a pdf")],
        "conv_id string, turn_idx int, text string")
    rows = {r["turn_idx"]: r for r in with_searchable_pdf(df).collect()}
    assert rows[1]["searchable_pdf"] is None  # containment -> NULL
    blob = bytes(rows[0]["searchable_pdf"])
    out = MiniPdf(blob)
    assert out.page_count == 1
    assert "SCANNED" in out.extract_page_text(0)  # OCR layer searchable
