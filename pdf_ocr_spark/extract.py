"""Spark-side extraction: vectorized per-batch implementation.

This is what runs inside ``mapInPandas`` — the whole reference pipeline
(detect -> route -> render -> preprocess -> OCR -> layout -> assemble)
re-expressed over Arrow batches. Routing and geometry are vectorized
(pandas/numpy); per-document decode work iterates documents *within* a batch,
which is the Arrow-batch analog of the reference's per-request loop — there
is no per-row Python UDF dispatch anywhere.

Byte-equality contract: for every payload, ``extract_batch`` must produce the
same (extracted_text, spans) as ``pdf_ocr_spark.oracle.extract_turn`` —
enforced by tests/test_pipeline_equality.py.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from .config import DEFAULT, EngineConfig
from .detector import decode_pdf_payload, detect_pdf
from .html_extract import extract_html_blocks
from .kernels import binarize, denoise, deskew
from .ocr import layout
from .ocr.engine import get_engine

_PDF_PREFIX = "JVBERi"

RESULT_COLUMNS = [
    "extracted_text", "spans", "method", "confidence", "n_pages", "error",
    "elapsed_us",
]

# Per-worker-process payload-dedup cache (identical attachments recur in
# real transcript tables; the reference's task-id dedup has the same
# purpose). Keyed by (cfg hash, md5 of payload) — the cfg term matters
# because Python workers are reused across jobs in one SparkSession: a
# second run with different preprocessing flags / dpi / backend must
# never be served results decoded under the first run's config
# (code-review r3). Bounded FIFO — by entry count AND by bytes: entries
# hold full extraction results (text + spans), and 512 multi-MB texts
# would pin gigabytes of Python heap per worker on large-PDF corpora
# (the flagship plan's dedup-before-decode already makes hits ~0 there).
_PDF_CACHE: dict = {}
_PDF_CACHE_MAX = 512
_PDF_CACHE_MAX_BYTES = 256 * 1024 * 1024
_PDF_CACHE_BYTES = 0


def _entry_bytes(value) -> int:
    """Approximate heap cost of a cached result: dominated by the
    extracted text (item 0 of the result tuple); spans/metadata are
    proportional and covered by the 2x factor."""
    text = value[0] if value and isinstance(value[0], str) else ""
    return 2 * len(text) + 256


def _pdf_cache_key(payload: str, cfg: EngineConfig) -> tuple:
    """One md5 pass per lookup (the digest is reused for the put on a
    miss); EngineConfig is a frozen dataclass, so hash(cfg) is stable
    within the worker process."""
    import hashlib
    return (hash(cfg), hashlib.md5(payload.encode()).digest())


def _pdf_cache_get(key: tuple, counters: dict | None = None):
    """Cache lookup; ``counters`` is an optional dict of Spark
    accumulators ("cache_hits"/"cache_misses") so bench/lineage can
    attribute throughput to cold decodes vs warm hits (VERDICT r2 #7)."""
    hit = _PDF_CACHE.get(key)
    if counters is not None:
        counters["cache_hits" if hit is not None else "cache_misses"] \
            .add(1)
    return hit


def _pdf_cache_put(key: tuple, value) -> None:
    global _PDF_CACHE_BYTES
    nb = _entry_bytes(value)
    if nb > _PDF_CACHE_MAX_BYTES:
        return  # a single oversized result must not evict everything
    while _PDF_CACHE and (len(_PDF_CACHE) >= _PDF_CACHE_MAX
                          or _PDF_CACHE_BYTES + nb
                          > _PDF_CACHE_MAX_BYTES):
        old = _PDF_CACHE.pop(next(iter(_PDF_CACHE)))  # FIFO evict
        _PDF_CACHE_BYTES -= _entry_bytes(old)
    _PDF_CACHE[key] = value
    _PDF_CACHE_BYTES += nb


def _spans(paragraphs: list, sep_len: int = 2) -> list:
    out = []
    pos = 0
    for i, p in enumerate(paragraphs):
        if i > 0:
            pos += sep_len
        out.append({"start": pos, "end": pos + len(p)})
        pos += len(p)
    return out


def route_kinds(texts: pd.Series) -> pd.Series:
    """Vectorized payload routing (cheap prefix tests, no decode).

    NULL/NaN payloads route to kind "null" (-> explicit error rows); the
    prefix tests run on a ''-filled copy so the boolean masks stay boolean.
    """
    is_null = texts.isna().to_numpy()
    filled = texts.fillna("")
    # lstrip before the PDF prefix test too (matching
    # detector.detect_payload_kind): b64decode ignores whitespace, so a
    # '\nJVBERi...' payload must decode as a PDF here on the light path
    # even though the pipeline's raw-prefix scan pushdown routed it away
    # from the dedup-before-decode path
    stripped = filled.str.lstrip()
    is_pdf = stripped.str.startswith(_PDF_PREFIX).to_numpy()
    head = stripped.str.slice(0, 15).str.lower()
    is_html = (head.str.startswith("<!doctype html") |
               head.str.startswith("<html")).to_numpy()
    return pd.Series(
        np.select([is_null, is_pdf, is_html], ["null", "pdf_b64", "html"],
                  default="plain"),
        index=texts.index)


def _extract_pdf_doc(text: str, cfg: EngineConfig) -> tuple:
    """One PDF document -> (text, spans, method, conf, n_pages, error).

    Orchestration mirrors the reference task loop (api/ocr.py:68-318) with
    the vectorized layout core; see oracle._extract_pdf for the loop-style
    twin and the inline citations. Document-level containment mirrors the
    reference's task-level try/except (api/ocr.py:308-318): a corrupt
    payload yields an error row, never a task failure.
    """
    try:
        return _extract_pdf_doc_inner(text, cfg)
    except Exception as e:
        return "", [], "error", 0.0, 0, f"{type(e).__name__}: {e}"


def _extract_pdf_doc_inner(text: str, cfg: EngineConfig) -> tuple:
    from .minipdf.adapters import open_pdf
    try:
        pdf = open_pdf(decode_pdf_payload(text, cfg.max_payload_bytes),
                       backend=cfg.pdf_backend)
    except ValueError as e:
        return "", [], "error", 0.0, 0, str(e)
    info = detect_pdf(pdf, threshold=cfg.pdf_text_threshold,
                      sample_page_limit=cfg.detect_sample_page_limit,
                      sample_head=cfg.detect_sample_head,
                      sample_tail=cfg.detect_sample_tail)
    dpi = max(cfg.min_dpi, min(cfg.max_dpi, cfg.default_dpi))

    if info.pdf_type == "text":
        page_texts = [pdf.extract_text(p) for p in range(info.page_count)]
        return ("\n\n".join(page_texts), _spans(page_texts), "extract", 1.0,
                info.page_count, None)

    engine = get_engine()
    image_pages = set(info.image_pages)
    rows = []
    processed = []
    for page_num in range(info.page_count):
        if page_num not in image_pages:
            rows.append({"page": page_num,
                         "text": pdf.extract_text(page_num),
                         "confidence": 1.0})
            continue
        try:
            img = pdf.render_page(page_num, dpi=dpi)
            if cfg.preprocess_denoise:
                img = denoise(img, method="gaussian")
            if cfg.preprocess_deskew:
                img, _ = deskew(img)
            if cfg.preprocess_binarize:
                img = binarize(img, method="otsu")
        except Exception as e:
            rows.append({"page": page_num, "text": "", "confidence": 0.0,
                         "error": str(e)})
            continue
        res = engine.recognize(img, page_num)
        texts = [l.text for l in res.lines]
        boxes = np.array([l.box for l in res.lines], dtype=float) \
            if res.lines else np.empty((0, 4, 2))
        confs = np.array([l.confidence for l in res.lines], dtype=float)
        page = layout.process_page(
            texts, boxes, confs, page_num=page_num,
            img_width=res.img_width, img_height=res.img_height,
            spacing_threshold=cfg.paragraph_line_spacing_threshold,
            column_aware=cfg.column_aware)
        processed.append(page)
        rows.append({"page": page_num, "text": page.text,
                     "confidence": res.avg_confidence,
                     "paragraphs": [p.text for p in page.paragraphs]})

    if cfg.remove_header_footer and processed:
        final_pages = layout.remove_headers_footers(
            processed, cfg.header_footer_repeat_threshold)
        # positional patch, faithfully misaligned for mixed docs
        # (api/ocr.py:275-282)
        for idx, page in enumerate(final_pages):
            if idx < len(rows):
                rows[idx]["text"] = page.text
                rows[idx]["paragraphs"] = [p.text for p in page.paragraphs]

    paragraphs: list[str] = []
    for row in rows:
        if "paragraphs" in row:
            paragraphs.extend(row["paragraphs"])
        else:
            paragraphs.append(row.get("text", ""))
    conf = sum(r["confidence"] for r in rows) / len(rows) if rows else 0.0
    return ("\n\n".join(paragraphs), _spans(paragraphs), "ocr", conf,
            info.page_count, None)


def _cached_pdf_extract(payload: str, cfg: EngineConfig,
                        counters: dict | None):
    """One cache-keyed decode — the SINGLE code path both the light
    batch and the distinct-payload batch go through, so the two stages
    cannot drift on cache keying or result-tuple shape (byte-equality
    contract with oracle.extract_turn)."""
    key = _pdf_cache_key(payload, cfg)
    hit = _pdf_cache_get(key, counters)
    if hit is None:
        hit = _extract_pdf_doc(payload, cfg)
        _pdf_cache_put(key, hit)
    return hit


def extract_payload_batch(texts: pd.Series, cfg: EngineConfig = DEFAULT,
                          counters: dict | None = None) -> pd.DataFrame:
    """Extract a batch of *distinct PDF payloads* (the dedup-before-decode
    pre-pass): one decode per unique payload cluster-wide. Returns the same
    RESULT_COLUMNS frame as extract_batch."""
    n = len(texts)
    out = {c: np.empty(n, dtype=object) for c in
           ("extracted_text", "spans", "method", "error")}
    conf = np.zeros(n)
    pages = np.zeros(n, dtype=np.int32)
    us = np.zeros(n, dtype=np.int64)
    vals = texts.to_numpy(dtype=object)
    for i in range(n):
        t0 = time.perf_counter_ns()
        hit = _cached_pdf_extract(vals[i], cfg, counters)
        text, spans, method, c, n_pages, err = hit
        out["extracted_text"][i] = text
        out["spans"][i] = list(spans)
        out["method"][i] = method
        out["error"][i] = err
        conf[i] = c
        pages[i] = n_pages
        us[i] = (time.perf_counter_ns() - t0) // 1000
    return pd.DataFrame({
        "extracted_text": out["extracted_text"], "spans": out["spans"],
        "method": out["method"], "confidence": conf, "n_pages": pages,
        "error": out["error"], "elapsed_us": us,
    }, index=texts.index)


def extract_batch(texts: pd.Series, cfg: EngineConfig = DEFAULT,
                  counters: dict | None = None) -> pd.DataFrame:
    """Extract a batch of turn payloads -> result frame (RESULT_COLUMNS)."""
    n = len(texts)
    kinds = route_kinds(texts)
    out_text = np.empty(n, dtype=object)
    out_spans = np.empty(n, dtype=object)
    out_method = np.empty(n, dtype=object)
    out_conf = np.zeros(n)
    out_pages = np.zeros(n, dtype=np.int32)
    out_err = np.full(n, None, dtype=object)
    out_us = np.zeros(n, dtype=np.int64)

    vals = texts.to_numpy(dtype=object)
    kind_arr = kinds.to_numpy()

    # null: explicit error rows, never silently dropped (lineage
    # rows_in/rows_out must balance — ADVICE r1)
    null_mask = kind_arr == "null"
    if null_mask.any():
        out_text[null_mask] = ""
        spans_arr = np.empty(int(null_mask.sum()), dtype=object)
        spans_arr[:] = [[] for _ in range(int(null_mask.sum()))]
        out_spans[null_mask] = spans_arr
        out_method[null_mask] = "error"
        out_err[null_mask] = "null_payload"

    # plain: fully bulk passthrough (no per-row loop)
    plain_mask = kind_arr == "plain"
    if plain_mask.any():
        t0 = time.perf_counter_ns()
        out_text[plain_mask] = vals[plain_mask]
        spans_arr = np.empty(int(plain_mask.sum()), dtype=object)
        spans_arr[:] = [
            [{"start": 0, "end": len(t)}] if t else []
            for t in vals[plain_mask]
        ]
        out_spans[plain_mask] = spans_arr
        out_method[plain_mask] = "plain"
        out_conf[plain_mask] = 1.0
        out_pages[plain_mask] = 1
        n_plain = int(plain_mask.sum())
        out_us[plain_mask] = ((time.perf_counter_ns() - t0) // 1000) \
            // n_plain

    for i in np.nonzero(kind_arr == "html")[0]:
        t0 = time.perf_counter_ns()
        try:
            blocks = extract_html_blocks(
                vals[i], strip_tags=cfg.html_strip_tags,
                repeat_threshold=cfg.html_repeat_threshold)
            out_text[i] = "\n\n".join(blocks)
            out_spans[i] = _spans(blocks)
            out_method[i] = "html"
            out_conf[i] = 1.0
        except Exception as e:  # parser pathology -> error row, not a
            out_text[i] = ""    # task failure (reference C6 containment)
            out_spans[i] = []
            out_method[i] = "error"
            out_conf[i] = 0.0
            out_err[i] = f"{type(e).__name__}: {e}"
        out_pages[i] = 1
        out_us[i] = (time.perf_counter_ns() - t0) // 1000

    pdf_idx = np.nonzero(kind_arr == "pdf_b64")[0]
    for i in pdf_idx:
        t0 = time.perf_counter_ns()
        hit = _cached_pdf_extract(vals[i], cfg, counters)
        text, spans, method, conf, n_pages, err = hit
        out_text[i] = text
        out_spans[i] = list(spans)
        out_method[i] = method
        out_conf[i] = conf
        out_pages[i] = n_pages
        out_err[i] = err
        out_us[i] = (time.perf_counter_ns() - t0) // 1000

    return pd.DataFrame({
        "extracted_text": out_text,
        "spans": out_spans,
        "method": out_method,
        "confidence": out_conf,
        "n_pages": out_pages,
        "error": out_err,
        "elapsed_us": out_us,
    }, index=texts.index)
