"""S10/S11 document-model layer: DOCX block model + searchable-PDF overlay.

The reference's DOCX and searchable-PDF exporters are binary document
authoring (python-docx / PyMuPDF) — out of scope for an analytics engine
(SURVEY §2.1). What IS in scope, and implemented here, is everything the
authoring libraries are fed: the markdown block parsing, styled-run
splitting, confidence highlighting, and the image->PDF coordinate/font
arithmetic. A downstream renderer (python-docx, reportlab, PyMuPDF) can
consume these models verbatim.

Faithful ports (quirks preserved, pinned in tests/test_docx_model.py):

- ``parse_markdown_blocks`` = ``DocxExporter._add_markdown_content``
  parsing (docx_export.py:114-162): paragraphs joined "\\n" first, blank
  lines skipped, heading level = leading-# count clamped at 9, unordered
  list content IS stripped but ordered list content is NOT (the reference
  strips via ``line[2:].strip()`` on one branch and keeps
  ``match.group(2)`` raw on the other), ``**bold**`` runs split with the
  non-greedy regex, empty split parts still become (empty) runs.
- ``confidence_runs`` = ``export_with_confidence`` (docx_export.py:200-213):
  paragraphs below the threshold render as red runs.
- ``overlay_spec`` = ``SearchablePDFCreator._add_text_layer``
  (searchable_pdf.py:72-105): x/y scaled by 72/dpi, font size =
  height*scale*0.8 with the reference's quirky floor (only sizes BELOW 1
  jump to 8 — sizes in [1, 8) pass through), baseline at y + font_size,
  render_mode 3 (invisible but searchable).
"""

from __future__ import annotations

import re
from typing import Iterator

_ORDERED_RE = re.compile(r"^(\d+\.\s)(.*)")
_BOLD_SPLIT_RE = re.compile(r"(\*\*.*?\*\*)")


def split_bold_runs(content: str) -> list:
    """``**bold**`` run splitting (docx_export.py:157-162). Returns
    [(text, bold)] — empty parts kept, like the reference's add_run('')."""
    runs = []
    for part in _BOLD_SPLIT_RE.split(content):
        if part.startswith("**") and part.endswith("**") and len(part) > 4:
            runs.append((part[2:-2], True))
        else:
            runs.append((part, False))
    return runs


def parse_markdown_blocks(paragraph_texts: list) -> list:
    """Markdown -> block model (docx_export.py:114-162).

    Returns a list of dicts:
      {"type": "heading", "level": int, "text": str}
      {"type": "list_bullet" | "list_number" | "paragraph",
       "runs": [(text, bold)]}
    """
    full_text = "\n".join(paragraph_texts)  # docx_export.py:119
    blocks = []
    for line in full_text.split("\n"):
        line = line.strip()
        if not line:
            continue
        if line.startswith("#"):
            level = 0
            for char in line:
                if char == "#":
                    level += 1
                else:
                    break
            content = line[level:].strip()
            if level > 9:
                level = 9
            blocks.append({"type": "heading", "level": level,
                           "text": content})
            continue
        if line.startswith("- ") or line.startswith("* "):
            content = line[2:].strip()
            btype = "list_bullet"
        else:
            m = _ORDERED_RE.match(line)
            if m:
                content = m.group(2)  # NOT stripped — reference quirk
                btype = "list_number"
            else:
                content = line
                btype = "paragraph"
        blocks.append({"type": btype, "runs": split_bold_runs(content)})
    return blocks


def confidence_runs(paragraphs: list,
                    threshold: float | None = None) -> list:
    """Low-confidence highlighting model (docx_export.py:200-213):
    [(text, is_red)] — one run per paragraph, red below threshold
    (default EngineConfig.ocr_confidence_threshold, reference
    config.py:66). ``paragraphs``: [(text, avg_confidence)]."""
    if threshold is None:
        from .config import DEFAULT
        threshold = DEFAULT.ocr_confidence_threshold
    return [(text, conf < threshold) for text, conf in paragraphs]


def overlay_spec(lines: list, dpi: int = 300) -> list:
    """Searchable-PDF text-layer plan (searchable_pdf.py:72-105).

    ``lines``: [(text, x_min, y_min, height)] in image pixels at ``dpi``.
    Returns [{"text", "x", "y_baseline", "font_size", "render_mode"}] in
    PDF points. Faithful quirk: font sizes below 1 become 8; sizes in
    [1, 8) pass through unchanged (searchable_pdf.py:90-92)."""
    scale = 72.0 / dpi
    out = []
    for text, x_min, y_min, height in lines:
        font_size = height * scale * 0.8
        if font_size < 1:
            font_size = 8
        out.append({
            "text": text,
            "x": x_min * scale,
            "y_baseline": y_min * scale + font_size,  # insert point is
            "font_size": font_size,                   # y + font_size
            "render_mode": 3,                         # invisible+searchable
        })
    return out


DOCX_BLOCKS_SCHEMA = ("conv_id string, turn_idx int, blocks_json string")


def with_docx_blocks(df):
    """Column-level S10 model over the output table: parse each turn's
    extracted_text into the markdown block model, emitted as a JSON
    column via an Arrow-batched stage (parsing is line-loop logic — the
    per-item work stays inside the batch, no per-row UDF dispatch)."""
    import json

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"conv_id": batch["conv_id"].values,
                   "turn_idx": batch["turn_idx"].values,
                   "blocks_json": [
                       json.dumps(parse_markdown_blocks((t or "")
                                                        .split("\n\n")),
                                  ensure_ascii=False)
                       for t in batch["extracted_text"].values]}
            yield pd.DataFrame(out)

    return df.select("conv_id", "turn_idx", "extracted_text") \
        .mapInPandas(run, schema=DOCX_BLOCKS_SCHEMA)
