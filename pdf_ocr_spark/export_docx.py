"""S10 binary DOCX authoring — stdlib-only OOXML writer.

The reference exports Word documents through python-docx
(SmartPDF-OCR ``app/export/docx_export.py:45-216``); that library is not
in this environment, and a DOCX file is just a ZIP of WordprocessingML
parts — so this module serializes the package directly with ``zipfile`` +
string XML. It consumes the quirk-pinned block model from
``docx_model.py`` verbatim (the split documented there: model = what the
authoring library is fed; this file = the authoring), producing what the
reference produces:

- page setup A4 21.0 x 29.7 cm with 2.54 cm margins
  (``_setup_page``, docx_export.py:91-99 — Cm -> twips, 1 cm = 567),
- optional centered title heading (``_add_title``, docx_export.py:101-104),
- markdown blocks -> Heading1-9 / List Bullet / List Number / body
  paragraphs with bold runs (``_add_markdown_content``,
  docx_export.py:114-162),
- every run carries the font name + size AND the eastAsia font attribute
  (``_add_run_with_style``, docx_export.py:164-174 — the reference sets
  ``w:rFonts/@w:eastAsia`` explicitly so CJK text picks the same face),
- confidence export: one run per paragraph, red (FF0000) below the
  threshold (``export_with_confidence``, docx_export.py:176-216).

Scale shape: authoring is a pure bytes-from-model function, exposed as an
Arrow-batched column stage (``with_docx_export``) — one .docx binary per
turn, embarrassingly parallel, no driver-side file loop.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.sax.saxutils import escape

from .docx_model import confidence_runs, parse_markdown_blocks

# XML 1.0 forbids control chars (except \t \n \r), surrogates, and the
# noncharacters U+FFFE/U+FFFF — real extracted_text can carry form feeds
# etc., which would make document.xml unparseable (code-review r3).
# Stripping (python-docx raises instead) keeps authoring total.
_XML_INVALID = re.compile(
    "[^\t\n\r\u0020-\ud7ff\ue000-\ufffd\U00010000-\U0010ffff]")


def _xml_safe(s: str) -> str:
    return _XML_INVALID.sub("", s)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

# python-docx defaults mirrored by the reference constructor
# (docx_export.py:18-26); Cm -> twentieths of a point: 1 cm = 567 twips
_PAGE_W_TWIPS = int(21.0 * 567)    # 11907
_PAGE_H_TWIPS = int(29.7 * 567)    # 16839
_MARGIN_TWIPS = int(2.54 * 567)    # 1440

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/word/styles.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>'
    '</Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    '</Relationships>')

_DOC_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    '</Relationships>')


def _styles_xml() -> str:
    """Minimal style sheet declaring the styles the reference's paragraphs
    reference: Title, Heading1-9, ListBullet, ListNumber."""
    parts = [f'<w:styles xmlns:w="{_W}">']
    parts.append(
        '<w:style w:type="paragraph" w:styleId="Title">'
        '<w:name w:val="Title"/></w:style>')
    for lvl in range(1, 10):
        parts.append(
            f'<w:style w:type="paragraph" w:styleId="Heading{lvl}">'
            f'<w:name w:val="heading {lvl}"/>'
            f'<w:pPr><w:outlineLvl w:val="{lvl - 1}"/></w:pPr>'
            f'<w:rPr><w:b/></w:rPr></w:style>')
    for sid, name in (("ListBullet", "List Bullet"),
                      ("ListNumber", "List Number")):
        parts.append(
            f'<w:style w:type="paragraph" w:styleId="{sid}">'
            f'<w:name w:val="{name}"/></w:style>')
    parts.append('</w:styles>')
    return "".join(parts)


# constant bytes — built once, not per authored document (review)
_STYLES_XML = _styles_xml()


def _run_xml(text: str, font_name: str, font_size_pt: int,
             bold: bool = False, color: str | None = None) -> str:
    """One w:r with the reference's run styling (docx_export.py:164-174):
    ascii + eastAsia font, half-point size, optional bold / color."""
    # attribute context: escape() alone leaves '"' unescaped, which would
    # break the XML for a font name containing quotes (code-review r3)
    fn = escape(_xml_safe(font_name), {'"': "&quot;"})
    rpr = [f'<w:rFonts w:ascii="{fn}" w:eastAsia="{fn}"/>']
    if bold:
        rpr.append('<w:b/>')
    if color:
        rpr.append(f'<w:color w:val="{color}"/>')
    rpr.append(f'<w:sz w:val="{font_size_pt * 2}"/>')
    return (f'<w:r><w:rPr>{"".join(rpr)}</w:rPr>'
            f'<w:t xml:space="preserve">{escape(_xml_safe(text))}</w:t>'
            f'</w:r>')


def _p_xml(runs_xml: str, style: str | None = None,
           line_spacing: float | None = None,
           center: bool = False) -> str:
    ppr = []
    if style:
        ppr.append(f'<w:pStyle w:val="{style}"/>')
    if center:
        ppr.append('<w:jc w:val="center"/>')
    if line_spacing is not None:
        # python-docx line_spacing float -> w:spacing line in 240ths
        ppr.append(f'<w:spacing w:line="{int(line_spacing * 240)}" '
                   f'w:lineRule="auto"/>')
    head = f'<w:pPr>{"".join(ppr)}</w:pPr>' if ppr else ''
    return f'<w:p>{head}{runs_xml}</w:p>'


_SECT = (f'<w:sectPr><w:pgSz w:w="{_PAGE_W_TWIPS}" w:h="{_PAGE_H_TWIPS}"/>'
         f'<w:pgMar w:top="{_MARGIN_TWIPS}" w:right="{_MARGIN_TWIPS}" '
         f'w:bottom="{_MARGIN_TWIPS}" w:left="{_MARGIN_TWIPS}"/>'
         f'</w:sectPr>')

_PAGE_BREAK = '<w:p><w:r><w:br w:type="page"/></w:r></w:p>'


def _package(document_xml: str) -> bytes:
    """Zip the parts with a FIXED timestamp (DOS epoch): authoring the
    same model twice yields byte-identical .docx, so downstream exact
    dedup / content-hash lineage over the binary column stays stable."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
                ("[Content_Types].xml", _CONTENT_TYPES),
                ("_rels/.rels", _RELS),
                ("word/_rels/document.xml.rels", _DOC_RELS),
                ("word/styles.xml", _STYLES_XML),
                ("word/document.xml", document_xml)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data)
    return buf.getvalue()


def docx_bytes(pages_blocks: list, title: str | None = None,
               font_name: str = "宋体", font_size: int = 12,
               line_spacing: float = 1.5,
               include_page_breaks: bool = True) -> bytes:
    """Author a .docx from per-page block models
    (``docx_model.parse_markdown_blocks`` output), mirroring
    DocxExporter.export with is_markdown=True (docx_export.py:45-162):
    title first (centered Title style), page breaks BETWEEN pages only."""
    body = []
    if title:
        body.append(_p_xml(_run_xml(title, font_name, font_size),
                           style="Title", center=True))
    for i, blocks in enumerate(pages_blocks):
        for b in blocks:
            if b["type"] == "heading":
                body.append(_p_xml(
                    _run_xml(b["text"], font_name, font_size),
                    style=f'Heading{b["level"]}'))
            else:
                runs = "".join(
                    _run_xml(text, font_name, font_size, bold=bold)
                    for text, bold in b["runs"])
                if b["type"] == "list_bullet":
                    body.append(_p_xml(runs, style="ListBullet"))
                elif b["type"] == "list_number":
                    body.append(_p_xml(runs, style="ListNumber"))
                else:
                    body.append(_p_xml(runs, line_spacing=line_spacing))
        if include_page_breaks and i < len(pages_blocks) - 1:
            body.append(_PAGE_BREAK)  # docx_export.py:85-87: between only
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{_W}"><w:body>'
           f'{"".join(body)}{_SECT}</w:body></w:document>')
    return _package(doc)


def docx_confidence_bytes(paragraphs: list,
                          threshold: float | None = None,
                          font_name: str = "宋体",
                          font_size: int = 12) -> bytes:
    """export_with_confidence (docx_export.py:176-216): one run per
    paragraph, red FF0000 below the threshold. ``paragraphs``:
    [(text, avg_confidence)] — routed through the model layer's
    ``confidence_runs`` so the flagging logic stays single-sourced."""
    body = [
        _p_xml(_run_xml(text, font_name, font_size,
                        color="FF0000" if is_red else None))
        for text, is_red in confidence_runs(paragraphs, threshold)
    ]
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{_W}"><w:body>'
           f'{"".join(body)}{_SECT}</w:body></w:document>')
    return _package(doc)


DOCX_EXPORT_SCHEMA = "conv_id string, turn_idx int, docx binary"


def with_docx_export(df, title_from_conv: bool = True):
    """Column-level S10 export: one .docx binary per turn, authored from
    the turn's extracted_text via the markdown block model. Arrow-batched
    mapInPandas — authoring is per-item inside the batch, no per-row UDF
    dispatch, no driver-side loop."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"conv_id": batch["conv_id"].values,
                   "turn_idx": batch["turn_idx"].values,
                   "docx": [
                       docx_bytes(
                           [parse_markdown_blocks((t or "").split("\n\n"))],
                           title=(c if title_from_conv else None))
                       for c, t in zip(batch["conv_id"].values,
                                       batch["extracted_text"].values)]}
            yield pd.DataFrame(out)

    return df.select("conv_id", "turn_idx", "extracted_text") \
        .mapInPandas(run, schema=DOCX_EXPORT_SCHEMA)
