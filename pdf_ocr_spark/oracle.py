"""Single-process reference-semantics oracle.

Per-turn extraction implemented as straight Python loops that mirror the
reference's control flow step by step (citations inline) — NOT the vectorized
implementation the Spark UDFs use (``pdf_ocr_spark.ocr.layout``). The
equality tests run both over the same fixtures and require byte-identical
``extracted_text`` and spans per (conv_id, turn_idx).

Shared with the Spark path (deliberately): the minipdf reader, the
deterministic OCR engine, the preprocess kernels, and the HTML extractor —
those are the pluggable "hardware" both sides must agree on; everything
downstream (detection arithmetic, routing, layout, header/footer,
assembly) is implemented twice.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from .config import DEFAULT, EngineConfig
from .detector import (
    KIND_HTML, KIND_PDF, decode_pdf_payload, detect_payload_kind, detect_pdf,
)
from .html_extract import extract_html_blocks
from .kernels import denoise, deskew, binarize
from .minipdf import MiniPdf
from .ocr.engine import OCRLine, OCRResult, get_engine


@dataclass
class RefParagraph:
    """Reference Paragraph (postprocess.py:15-25)."""
    text: str
    lines: list

    @property
    def avg_confidence(self) -> float:
        if not self.lines:
            return 0.0
        return sum(l.confidence for l in self.lines) / len(self.lines)


@dataclass
class RefPage:
    """Reference ProcessedPage (postprocess.py:28-44)."""
    page_num: int
    paragraphs: list
    header: str | None = None
    footer: str | None = None

    @property
    def text(self) -> str:
        return "\n\n".join(p.text for p in self.paragraphs)


_PAGENO_RX = re.compile(r"^\s*[\-－]?\s*\d+\s*[\-－]?\s*$")
_LIST_RX = [
    re.compile(r"^\d+[.、）)]"),
    re.compile(r"^[一二三四五六七八九十]+[.、）)]"),
    re.compile(r"^[（(]\d+[）)]"),
    re.compile(r"^[•·▪▸►◆○●■□]"),
]


def _ref_y_overlap(a: OCRLine, b: OCRLine) -> float:
    """postprocess.py:204-221"""
    lo = max(a.y_min, b.y_min)
    hi = min(a.y_max, b.y_max)
    if hi <= lo:
        return 0.0
    mh = min(a.height, b.height)
    if mh == 0:
        return 0.0
    return (hi - lo) / mh


def _ref_merge_group(texts: list, boxes: list, confs: list) -> OCRLine:
    """postprocess.py:223-252"""
    items = sorted(zip(texts, boxes, confs), key=lambda it: it[1][0][0])
    joined = " ".join(t for t, _, _ in items)
    pts = [p for _, box, _ in items for p in box]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    box = [[min(xs), min(ys)], [max(xs), min(ys)],
           [max(xs), max(ys)], [min(xs), max(ys)]]
    return OCRLine(text=joined, confidence=sum(confs) / len(confs), box=box)


def _ref_merge_rows(lines: list) -> list:
    """postprocess.py:167-202 — compare each line to the group head."""
    if not lines:
        return []
    merged = []
    head = lines[0]
    g_texts, g_boxes, g_confs = [head.text], [head.box], [head.confidence]
    for ln in lines[1:]:
        if _ref_y_overlap(head, ln) > 0.5:
            g_texts.append(ln.text)
            g_boxes.append(ln.box)
            g_confs.append(ln.confidence)
        else:
            merged.append(_ref_merge_group(g_texts, g_boxes, g_confs))
            head = ln
            g_texts, g_boxes, g_confs = [ln.text], [ln.box], [ln.confidence]
    merged.append(_ref_merge_group(g_texts, g_boxes, g_confs))
    return merged


def _ref_para_start(text: str) -> bool:
    """postprocess.py:291-308"""
    if text.startswith("    ") or text.startswith("\t"):
        return True
    s = text.strip()
    return any(rx.match(s) for rx in _LIST_RX)


def _ref_paragraphs(lines: list, spacing_threshold: float) -> list:
    """postprocess.py:254-313"""
    if not lines:
        return []
    paras = []
    cur = [lines[0]]
    avg_h = sum(l.height for l in lines) / len(lines)
    for i in range(1, len(lines)):
        gap = lines[i].y_min - lines[i - 1].y_max
        if gap > avg_h * spacing_threshold or _ref_para_start(lines[i].text):
            paras.append(RefParagraph(
                text="".join(l.text for l in cur), lines=cur))
            cur = [lines[i]]
        else:
            cur.append(lines[i])
    if cur:
        paras.append(RefParagraph(
            text="".join(l.text for l in cur), lines=cur))
    return paras


def _ref_filter_margins(lines: list, width: int, height: int,
                        ig_top: float, ig_bottom: float,
                        ig_left: float, ig_right: float) -> list:
    """postprocess.py:126-165"""
    if width <= 0 or height <= 0:
        return lines
    kept = []
    for ln in lines:
        cx = (ln.x_min + ln.x_max) / 2
        cy = (ln.y_min + ln.y_max) / 2
        px = cx / width * 100
        py = cy / height * 100
        ignored = False
        if ig_top > 0 and py < ig_top:
            ignored = True
        elif ig_bottom > 0 and py > 100 - ig_bottom:
            ignored = True
        elif ig_left > 0 and px < ig_left:
            ignored = True
        elif ig_right > 0 and px > 100 - ig_right:
            ignored = True
        if not ignored and py > 85 and _PAGENO_RX.match(ln.text):
            ignored = True
        if not ignored:
            kept.append(ln)
    return kept


def ref_process_page(ocr_result: OCRResult, cfg: EngineConfig = DEFAULT,
                     ig_top=0.0, ig_bottom=0.0, ig_left=0.0,
                     ig_right=0.0) -> RefPage:
    """postprocess.py:75-103"""
    lines = list(ocr_result.lines)
    if any([ig_top, ig_bottom, ig_left, ig_right]):
        lines = _ref_filter_margins(
            lines, ocr_result.img_width, ocr_result.img_height,
            ig_top, ig_bottom, ig_left, ig_right)
    lines.sort(key=lambda l: (l.y_min, l.x_min))
    merged = _ref_merge_rows(lines)
    paras = _ref_paragraphs(merged, cfg.paragraph_line_spacing_threshold)
    return RefPage(page_num=ocr_result.page_num, paragraphs=paras)


def ref_remove_headers_footers(pages: list, repeat_threshold: int) -> list:
    """postprocess.py:315-359"""
    if len(pages) < repeat_threshold:
        return pages
    firsts = [p.paragraphs[0].text.strip() for p in pages if p.paragraphs]
    lasts = [p.paragraphs[-1].text.strip() for p in pages if p.paragraphs]
    headers = {t for t, c in Counter(firsts).items() if c >= repeat_threshold}
    footers = {t for t, c in Counter(lasts).items() if c >= repeat_threshold}
    for page in pages:
        if page.paragraphs:
            if page.paragraphs[0].text.strip() in headers:
                page.header = page.paragraphs[0].text
                page.paragraphs = page.paragraphs[1:]
            if page.paragraphs and \
                    page.paragraphs[-1].text.strip() in footers:
                page.footer = page.paragraphs[-1].text
                page.paragraphs = page.paragraphs[:-1]
    return pages


# ---------------------------------------------------------------------------
# Per-turn extraction (the reference's process_ocr_task, app/api/ocr.py:68-318,
# with export_simple assembly, app/export/txt_export.py:79-108)
# ---------------------------------------------------------------------------

@dataclass
class TurnResult:
    extracted_text: str
    spans: list            # [(start, end)] paragraph offsets
    method: str            # extract | ocr | html | plain | error
    confidence: float
    n_pages: int
    error: str | None = None


def _spans_for(paragraphs: list, sep: str = "\n\n") -> list:
    spans = []
    pos = 0
    for i, p in enumerate(paragraphs):
        if i > 0:
            pos += len(sep)
        spans.append((pos, pos + len(p)))
        pos += len(p)
    return spans


def extract_turn(text: str, cfg: EngineConfig = DEFAULT,
                 dpi: int | None = None) -> TurnResult:
    """Extract one turn payload with reference semantics."""
    kind = detect_payload_kind(text)
    if kind == "null":
        # NULL payloads become explicit error rows — never silently dropped
        # (reference C6 containment; lineage rows_in/rows_out must balance)
        return TurnResult(extracted_text="", spans=[], method="error",
                          confidence=0.0, n_pages=0, error="null_payload")
    if kind == KIND_HTML:
        try:
            blocks = extract_html_blocks(
                text, strip_tags=cfg.html_strip_tags,
                repeat_threshold=cfg.html_repeat_threshold)
        except Exception as e:
            return TurnResult(extracted_text="", spans=[], method="error",
                              confidence=0.0, n_pages=1,
                              error=f"{type(e).__name__}: {e}")
        return TurnResult(
            extracted_text="\n\n".join(blocks),
            spans=_spans_for(blocks), method="html", confidence=1.0,
            n_pages=1)
    if kind != KIND_PDF:
        spans = [(0, len(text))] if text else []
        return TurnResult(extracted_text=text, spans=spans, method="plain",
                          confidence=1.0, n_pages=1)
    # document-level containment mirrors the reference task-level
    # try/except (api/ocr.py:308-318)
    try:
        try:
            data = decode_pdf_payload(text, cfg.max_payload_bytes)
            pdf = MiniPdf(data)
        except ValueError as e:
            return TurnResult(extracted_text="", spans=[], method="error",
                              confidence=0.0, n_pages=0, error=str(e))
        return _extract_pdf(pdf, cfg, dpi)
    except Exception as e:
        return TurnResult(extracted_text="", spans=[], method="error",
                          confidence=0.0, n_pages=0,
                          error=f"{type(e).__name__}: {e}")


def _extract_pdf(pdf: MiniPdf, cfg: EngineConfig,
                 dpi: int | None) -> TurnResult:
    info = detect_pdf(pdf, threshold=cfg.pdf_text_threshold,
                      sample_page_limit=cfg.detect_sample_page_limit,
                      sample_head=cfg.detect_sample_head,
                      sample_tail=cfg.detect_sample_tail)
    target_pages = list(range(info.page_count))  # pages=None => all
    # clamp dpi like the renderer (pdf_renderer.py:38-43)
    dpi = dpi or cfg.default_dpi
    dpi = max(cfg.min_dpi, min(cfg.max_dpi, dpi))

    # --- text-type: direct extraction path (api/ocr.py:119-161) ---
    if info.pdf_type == "text":
        page_texts = [pdf.extract_text(p) for p in target_pages]
        combined = "\n\n".join(page_texts)
        return TurnResult(
            extracted_text=combined, spans=_spans_for(page_texts),
            method="extract", confidence=1.0, n_pages=info.page_count)

    # --- image/mixed: render -> preprocess -> OCR path (api/ocr.py:163-269)
    engine = get_engine()
    rows = []          # the ocr_result.json rows
    processed: list[RefPage] = []  # OCR'd pages only (api/ocr.py:116)
    image_set = set(info.image_pages)  # O(1) membership in the page loop
    for page_num in target_pages:
        need_ocr = page_num in image_set
        if not need_ocr:
            rows.append({"page": page_num,
                         "text": pdf.extract_text(page_num),
                         "confidence": 1.0, "method": "extract"})
            continue
        try:
            img = pdf.render_page(page_num, dpi=dpi)
            if cfg.preprocess_denoise:
                img = denoise(img, method="gaussian")
            if cfg.preprocess_deskew:
                img, _ = deskew(img)
            if cfg.preprocess_binarize:
                img = binarize(img, method="otsu")
        except Exception as e:  # per-page containment (api/ocr.py:243-252)
            rows.append({"page": page_num, "text": "", "confidence": 0.0,
                         "error": str(e)})
            continue
        ocr_result = engine.recognize(img, page_num)
        page = ref_process_page(ocr_result, cfg)
        processed.append(page)
        rows.append({
            "page": page_num, "text": page.text,
            "confidence": ocr_result.avg_confidence,
            "paragraphs": [p.text for p in page.paragraphs],
            "method": "ocr",
        })

    # cross-page pass (api/ocr.py:271-282) — NOTE: the reference patches
    # rows by *position in the processed list*, which misaligns for mixed
    # docs where extract rows interleave; replicated faithfully.
    if cfg.remove_header_footer and processed:
        final_pages = ref_remove_headers_footers(
            processed, cfg.header_footer_repeat_threshold)
        for idx, page in enumerate(final_pages):
            if idx < len(rows):
                rows[idx]["text"] = page.text
                rows[idx]["paragraphs"] = [p.text for p in page.paragraphs]
                if page.header:
                    rows[idx]["header"] = page.header
                if page.footer:
                    rows[idx]["footer"] = page.footer

    # assembly: export_simple semantics (txt_export.py:79-108) over
    # convert_to_processed_pages rows (api/export.py:50-72): a row's
    # paragraphs if present, else its text as a single paragraph
    paragraphs: list[str] = []
    for row in rows:
        if "paragraphs" in row:
            paragraphs.extend(row["paragraphs"])
        else:
            paragraphs.append(row.get("text", ""))
    combined = "\n\n".join(paragraphs)
    conf = sum(r["confidence"] for r in rows) / len(rows) if rows else 0.0
    return TurnResult(
        extracted_text=combined, spans=_spans_for(paragraphs),
        method="ocr", confidence=conf, n_pages=info.page_count)
