"""Property-based checks for the r3 surfaces: the payload size gate, the
stdlib OOXML writer, the searchable-PDF round trip, and the reformatter
chunking invariants. Pure-python properties run at full hypothesis
example counts; nothing here touches Spark."""

import base64
import io
import xml.etree.ElementTree as ET
import zipfile

import pytest
from hypothesis import given, settings, strategies as st

from pdf_ocr_spark.detector import decode_pdf_payload
from pdf_ocr_spark.docx_model import overlay_spec, parse_markdown_blocks
from pdf_ocr_spark.enrich import (
    ChunkResult, merge_chunk_results, split_into_chunks,
)
from pdf_ocr_spark.export_docx import docx_bytes

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

# characters base64.b64decode(validate=False) ignores — includes junk
# well beyond whitespace (the ADVICE r2 case)
_IGNORED = st.sampled_from(list(" \t\r\n-_:;,!?*#@'\"<>"))


@given(
    body=st.binary(min_size=0, max_size=300),
    junk=st.lists(st.tuples(st.integers(0, 10 ** 6), _IGNORED),
                  max_size=200),
    cap_delta=st.integers(-20, 20),
)
@settings(max_examples=200, deadline=None)
def test_size_gate_never_false_rejects(body, junk, cap_delta):
    """decode_pdf_payload must accept iff the DECODED size fits the cap,
    no matter how many ignored characters pad the base64 text — the
    pre-decode estimate may only ever err toward the exact pass, and the
    exact pass must agree with b64decode's own skipping rule."""
    data = b"%PDF" + body
    text = base64.b64encode(data).decode()
    # inject ignored characters at arbitrary positions
    chars = list(text)
    for pos, ch in junk:
        chars.insert(pos % (len(chars) + 1), ch)
    padded = "".join(chars)
    cap = len(data) + cap_delta
    if cap >= len(data):
        assert decode_pdf_payload(padded, max_bytes=cap) == data
    else:
        with pytest.raises(ValueError):
            decode_pdf_payload(padded, max_bytes=cap)


_text_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=0, max_size=80)


@given(lines=st.lists(_text_line, min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_docx_writer_always_yields_wellformed_xml(lines):
    """Arbitrary unicode content (quotes, angle brackets, CJK, emoji)
    must produce a valid zip whose document.xml parses — the writer's
    escaping has no reachable failure mode."""
    blocks = parse_markdown_blocks(["\n".join(lines)])
    blob = docx_bytes([blocks], title='t"<&>\'')
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
        ET.fromstring(z.read("word/styles.xml"))
    # every non-blank input line's *content* appears in the document
    got = "".join(t.text or "" for t in root.iter(f"{_W}t"))
    for ln in lines:
        s = ln.strip()
        if s.startswith("#"):
            s = s.lstrip("#").strip()
        elif s.startswith("- ") or s.startswith("* "):
            s = s[2:].strip()
        for frag in (p for p in s.split("**") if p):
            assert frag in got


_ascii_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=1, max_size=40)


@given(texts=st.lists(_ascii_line, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_searchable_pdf_text_layer_round_trips(texts):
    """Author a searchable page from arbitrary printable-ASCII OCR lines
    (including parens/backslashes that need PDF string escaping) and read
    it back with the engine's own reader: the text layer must reproduce
    every line, in top-down order."""
    import numpy as np
    from pdf_ocr_spark.export_pdf import searchable_pdf_bytes
    from pdf_ocr_spark.minipdf import MiniPdf
    img = np.full((40 * (len(texts) + 1), 300), 255, dtype=np.uint8)
    lines = [(t, 10.0, 30.0 * (i + 1), 16.0) for i, t in enumerate(texts)]
    blob = searchable_pdf_bytes([img], [lines], dpi=72)
    got = MiniPdf(blob).extract_page_text(0).split("\n")
    assert got == texts


@given(size_pt=st.floats(0.01, 40), dpi=st.sampled_from([72, 150, 300]))
@settings(max_examples=100, deadline=None)
def test_overlay_font_floor_quirk_total(size_pt, dpi):
    """The reference's font floor (searchable_pdf.py:90-92): sizes below
    1 jump to 8, everything else passes through scaled."""
    (spec,) = overlay_spec([("x", 0.0, 0.0, size_pt)], dpi=dpi)
    expect = size_pt * (72.0 / dpi) * 0.8
    assert spec["font_size"] == (8 if expect < 1 else expect)


@given(
    paras=st.lists(st.text(alphabet="ab \n", max_size=120), max_size=12),
    max_chars=st.integers(10, 200),
)
@settings(max_examples=200, deadline=None)
def test_chunking_respects_budget_or_falls_back(paras, max_chars):
    """split_into_chunks invariant: every chunk fits the budget, except
    the documented whole-text fallback when nothing else survives."""
    text = "\n\n".join(paras)
    chunks = split_into_chunks(text, max_chars)
    assert chunks  # never empty
    if len(text) <= max_chars:
        assert chunks == [text]
    else:
        assert all(len(c) <= max_chars for c in chunks) \
            or chunks == [text]


@given(results=st.lists(
    st.builds(ChunkResult,
              original=st.text(max_size=20),
              formatted=st.text(max_size=20),
              success=st.booleans(),
              error=st.one_of(st.none(), st.text(min_size=1, max_size=10))),
    max_size=8))
@settings(max_examples=200, deadline=None)
def test_merge_fallback_semantics_total(results):
    """merge_chunk_results: failed chunks contribute their ORIGINAL text,
    success iff no chunk carried an error message (the reference's exact
    rule, reformatter.py:205-217)."""
    merged = merge_chunk_results(results)
    parts = [r.formatted if r.success else r.original for r in results]
    assert merged["formatted"] == "\n\n".join(parts)
    has_err = any((not r.success) and r.error for r in results)
    assert merged["success"] == (not has_err)
    assert merged["chunks_processed"] == sum(r.success for r in results)


_HWORD = st.text(alphabet="abcdefghijklmnop", min_size=3, max_size=8)
_STRIP = st.sampled_from(["nav", "footer", "header", "aside"])


@given(
    keeps=st.lists(_HWORD, min_size=1, max_size=6, unique=True),
    drops=st.lists(_HWORD, min_size=0, max_size=4, unique=True),
    strays=st.lists(st.tuples(st.integers(0, 5), _STRIP), max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_html_strip_containment_property(keeps, drops, strays):
    """Suppression containment (r4 stack semantics): text inside a
    well-formed strip container NEVER leaks, body-level block text is
    NEVER lost, and stray unmatched strip end tags sprinkled anywhere
    between body blocks change nothing."""
    from hypothesis import assume

    from pdf_ocr_spark.html_extract import extract_html_blocks
    assume(not set(keeps) & set(drops))
    stray_at = {}
    for pos, tag in strays:
        stray_at.setdefault(pos % (len(keeps) + 1), []).append(tag)
    parts = ["<html><body>"]
    for i, w in enumerate(keeps):
        for tag in stray_at.get(i, []):
            parts.append(f"</{tag}>")           # unmatched end tag
        parts.append(f"<p>{w}</p>")
        if i < len(drops):
            parts.append(f"<nav><div>{drops[i]}</div></nav>")
    for tag in stray_at.get(len(keeps), []):
        parts.append(f"</{tag}>")
    for w in drops[len(keeps):]:
        parts.append(f"<aside>{w}</aside>")
    parts.append("</body></html>")
    blocks = extract_html_blocks("".join(parts), repeat_threshold=99)
    assert blocks == list(keeps)


@given(
    words=st.lists(_HWORD, min_size=1, max_size=5, unique=True),
    container=_STRIP,
    close_head=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_html_unclosed_container_recovery_property(words, container,
                                                   close_head):
    """An unclosed boilerplate container that swallows everything
    triggers the hard-only fallback, and an unclosed <head> (with or
    without </head>) never suppresses body content."""
    from pdf_ocr_spark.html_extract import extract_html_blocks
    head = "<head><meta charset='x'>" + ("</head>" if close_head else "")
    body = "".join(f"<p>{w}</p>" for w in words)
    # unclosed container before ALL content: full parse sees nothing,
    # fallback recovers every block
    doc = f"<html>{head}<body><{container}>menu " + body + "</html>"
    blocks = extract_html_blocks(doc, repeat_threshold=99)
    for w in words:
        assert any(w in b for b in blocks)
