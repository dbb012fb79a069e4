"""Payload-kind detection and PDF type detection.

``detect_payload_kind`` is the cheap prefix router used Spark-side before any
heavy work: base64("%PDF") always starts with "JVBERi", HTML starts with a
doctype/html tag, everything else is plain chat text.

``detect_pdf`` replicates the reference's PDFDetector.detect exactly
(SmartPDF-OCR ``app/core/pdf_detector.py:38-122``), including the >50-page
sampling extrapolation arithmetic (head 15 / mid 15 / tail 15, sampled-only
char totals, type extrapolation) which changes observable output and must
match for byte equality.
"""

from __future__ import annotations

import base64
import binascii
from dataclasses import dataclass

from .minipdf import MiniPdf

KIND_PDF = "pdf_b64"
KIND_HTML = "html"
KIND_PLAIN = "plain"
KIND_NULL = "null"

_PDF_B64_PREFIX = "JVBERi"  # base64 of "%PDF"


def detect_payload_kind(text: str | None) -> str:
    """Cheap prefix router. The PDF check tolerates leading whitespace
    (like the HTML check, and like base64 decoding itself — b64decode
    ignores whitespace): a '\\nJVBERi...' payload from an upstream ETL
    must decode as a PDF, not be emitted verbatim as 'extracted' text.
    The PIPELINE's scan-level route keeps the raw-prefix pushdown
    (StringStartsWith on the unstripped column): whitespace-prefixed
    payloads just take the light path, where this detector routes them
    to the same decode — correctness everywhere, dedup-before-decode
    for the canonical (unprefixed) common case."""
    if text is None:
        return KIND_NULL
    head = text.lstrip()
    if head.startswith(_PDF_B64_PREFIX):
        return KIND_PDF
    head = head[:15].lower()
    if head.startswith("<!doctype html") or head.startswith("<html"):
        return KIND_HTML
    return KIND_PLAIN


from .config import MAX_PAYLOAD_BYTES

# str.translate table deleting the 64 base64 data characters; what survives
# is exactly the set b64decode(validate=False) ignores (whitespace, '=',
# and any other non-alphabet byte), so the exact-size pass below matches
# the decoder's own skipping rule (ADVICE r2: whitespace-only counting
# falsely rejected payloads padded with other ignored characters).
_B64_DATA_CHARS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                   "abcdefghijklmnopqrstuvwxyz0123456789+/")
_DEL_B64_DATA = str.maketrans("", "", _B64_DATA_CHARS)


def decode_pdf_payload(text: str,
                       max_bytes: int = MAX_PAYLOAD_BYTES) -> bytes:
    """base64 -> bytes with size + %PDF magic validation (the reference's
    validate_pdf checks, app/core/file_manager.py:60-96: size <= 100 MB,
    magic prefix). The size limit is enforced from the base64 length
    BEFORE decoding, so an oversized payload is rejected without ever
    allocating its decoded bytes — at 10^12-turn scale a hostile 1 GB
    payload must cost O(1), not O(size). Payloads whose cheap estimate
    exceeds the limit get one exact pass counting only base64 data
    characters (b64decode skips everything else — whitespace, padding,
    arbitrary junk bytes alike), so MIME line-wrapped or junk-padded
    payloads near the limit are never falsely rejected. The exact pass
    allocates at most the ignored-character substring (bounded by the
    input string already in memory), never the decoded bytes."""
    if len(text) * 3 // 4 > max_bytes:
        # exact data-char count: translate-delete the alphabet, what's
        # left is the ignored chars; '=' encodes no bytes so it is
        # (correctly) excluded from the data count
        n_data = len(text) - len(text.translate(_DEL_B64_DATA))
        if n_data * 3 // 4 > max_bytes:
            raise ValueError(
                f"payload exceeds max size ({max_bytes} bytes)")
    try:
        data = base64.b64decode(text, validate=False)
    except (binascii.Error, ValueError) as e:
        raise ValueError(f"invalid base64 payload: {e}") from None
    if not data.startswith(b"%PDF"):
        raise ValueError("decoded payload missing %PDF magic")
    return data


@dataclass
class PdfInfo:
    """Reference PDFInfo (pdf_detector.py:14-23)."""
    page_count: int
    pdf_type: str  # "text" | "image" | "mixed"
    text_pages: list
    image_pages: list
    total_text_chars: int
    avg_chars_per_page: float


def detect_pdf(pdf: MiniPdf, threshold: int = 50,
               sample_page_limit: int = 50,
               sample_head: int = 15, sample_tail: int = 15) -> PdfInfo:
    """Faithful replica of PDFDetector.detect (pdf_detector.py:38-122).

    ``sample_head``/``sample_tail`` parameterize the head/tail window
    sizes (EngineConfig.detect_sample_head/tail — previously declared
    but never wired, code-review r3); the reference hardcodes 15/15/15
    and the middle window stays the reference's fixed //2-7..//2+8."""
    page_count = pdf.page_count
    text_pages: list[int] = []
    image_pages: list[int] = []
    total_chars = 0

    sample_indices = range(page_count)
    is_sampled = False
    if page_count > sample_page_limit:
        is_sampled = True
        s1 = list(range(min(sample_head, page_count)))
        s2 = list(range(max(0, page_count // 2 - 7),
                        min(page_count, page_count // 2 + 8)))
        s3 = list(range(max(0, page_count - sample_tail), page_count))
        sample_indices = sorted(set(s1 + s2 + s3))

    for i in range(page_count):
        if is_sampled and i not in sample_indices:
            continue
        text = pdf.extract_page_text(i) or ""
        char_count = len(text.strip())
        total_chars += char_count
        if char_count >= threshold:
            text_pages.append(i)
        else:
            image_pages.append(i)

    if is_sampled:
        sample_set = set(sample_indices)
        sample_text_count = len([i for i in text_pages if i in sample_set])
        sample_image_count = len([i for i in image_pages if i in sample_set])
        if sample_text_count > 0 and sample_image_count > 0:
            pdf_type = "mixed"
        elif sample_text_count > 0:
            pdf_type = "text"
            text_pages = list(range(page_count))
            image_pages = []
        else:
            pdf_type = "image"
            image_pages = list(range(page_count))
            text_pages = []
        avg_chars = total_chars / len(sample_indices) if sample_indices else 0
    else:
        avg_chars = total_chars / page_count if page_count > 0 else 0
        if len(image_pages) == 0:
            pdf_type = "text"
        elif len(text_pages) == 0:
            pdf_type = "image"
        else:
            pdf_type = "mixed"

    return PdfInfo(
        page_count=page_count,
        pdf_type=pdf_type,
        text_pages=text_pages,
        image_pages=image_pages,
        total_text_chars=total_chars,
        avg_chars_per_page=avg_chars,
    )
