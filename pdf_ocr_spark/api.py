"""Task-level convenience API mirroring the reference service surface.

The reference exposes upload -> OCR-task -> result/export over HTTP
(SmartPDF-OCR ``app/api/``); a user switching to this engine gets the same
per-document semantics as plain functions (no Spark needed for one
document), and the batch pipeline (``pdf_ocr_spark.pipeline``) for tables.

``process_pdf_bytes`` returns the reference's ocr_result.json row shape
(api/ocr.py:126-133, 261-269): per page ``{page, text, confidence,
method[, paragraphs][, header][, footer][, error]}``.
"""

from __future__ import annotations

import base64

from .config import DEFAULT, EngineConfig
from .detector import detect_pdf
from .kernels import binarize, denoise, deskew
from .minipdf import MiniPdf
from .ocr.engine import get_engine
from .oracle import ref_process_page, ref_remove_headers_footers


def normalize_pages(pages: list | None, page_count: int) -> list:
    """Reference _normalize_pages (api/ocr.py:59-65): 1-based request list
    -> validated, deduped, sorted, 0-based; None -> all pages."""
    if not pages:
        return list(range(page_count))
    invalid = [p for p in pages if p < 1 or p > page_count]
    if invalid:
        raise ValueError(f"invalid page numbers: {invalid}")
    return [p - 1 for p in sorted(set(pages))]


def process_pdf_bytes(
    data: bytes,
    pages: list | None = None,
    dpi: int | None = None,
    preprocess: bool = True,
    do_denoise: bool = True,
    do_deskew: bool = True,
    do_binarize: bool = False,
    ignore_top: float = 0.0,
    ignore_bottom: float = 0.0,
    ignore_left: float = 0.0,
    ignore_right: float = 0.0,
    cfg: EngineConfig = DEFAULT,
) -> dict:
    """One document through the full reference task flow
    (api/ocr.py:68-318). Returns {"type", "pages", "combined"}."""
    pdf = MiniPdf(data)
    info = detect_pdf(pdf, threshold=cfg.pdf_text_threshold,
                      sample_page_limit=cfg.detect_sample_page_limit,
                      sample_head=cfg.detect_sample_head,
                      sample_tail=cfg.detect_sample_tail)
    target = normalize_pages(pages, info.page_count)
    dpi = dpi or cfg.default_dpi
    dpi = max(cfg.min_dpi, min(cfg.max_dpi, dpi))

    if info.pdf_type == "text":
        rows = [{"page": p, "text": pdf.extract_text(p),
                 "confidence": 1.0, "method": "extract"} for p in target]
        combined = "\n\n".join(r["text"] for r in rows)
        return {"type": "text", "pages": rows, "combined": combined}

    # NOTE: this loop is the user-facing twin of oracle._extract_pdf's
    # per-document path (same preprocess order, same deliberate
    # patch-by-processed-index misalignment for mixed docs — a pinned
    # reference quirk, oracle.py). A semantic change must land in both.
    engine = get_engine()
    rows = []
    processed = []
    image_set = set(info.image_pages)  # O(1) membership, O(P) lists
    for p in target:
        if p not in image_set:
            rows.append({"page": p, "text": pdf.extract_text(p),
                         "confidence": 1.0, "method": "extract"})
            continue
        try:
            img = pdf.render_page(p, dpi=dpi)
            if preprocess:
                if do_denoise:
                    img = denoise(img, method="gaussian")
                if do_deskew:
                    img, _ = deskew(img)
                if do_binarize:
                    img = binarize(img, method="otsu")
        except Exception as e:
            rows.append({"page": p, "text": "", "confidence": 0.0,
                         "error": str(e)})
            continue
        res = engine.recognize(img, p)
        page = ref_process_page(res, cfg, ignore_top, ignore_bottom,
                                ignore_left, ignore_right)
        processed.append(page)
        rows.append({"page": p, "text": page.text,
                     "confidence": res.avg_confidence,
                     "paragraphs": [x.text for x in page.paragraphs],
                     "method": "ocr"})

    if cfg.remove_header_footer and processed:
        final = ref_remove_headers_footers(
            processed, cfg.header_footer_repeat_threshold)
        for idx, page in enumerate(final):
            if idx < len(rows):
                rows[idx]["text"] = page.text
                rows[idx]["paragraphs"] = [x.text for x in page.paragraphs]
                if page.header:
                    rows[idx]["header"] = page.header
                if page.footer:
                    rows[idx]["footer"] = page.footer
    # the docstring (and the reference, SURVEY.md S8) promise combined
    # text on EVERY path — the ocr path omitted it (review r4)
    combined = "\n\n".join(r["text"] for r in rows)
    return {"type": "ocr", "pages": rows, "combined": combined}


def process_pdf_base64(payload: str, **kw) -> dict:
    # route through the engine's validated decode (O(1) oversize
    # rejection + %PDF magic + contained error semantics) instead of a
    # raw b64decode that would materialize a hostile multi-GB payload
    # (code-review r3)
    from .detector import decode_pdf_payload
    cfg = kw.get("cfg", DEFAULT)
    return process_pdf_bytes(
        decode_pdf_payload(payload, cfg.max_payload_bytes), **kw)
