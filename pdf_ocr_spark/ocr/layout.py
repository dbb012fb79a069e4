"""Layout postprocessing — vectorized implementation of the reference's
algorithmic core (SmartPDF-OCR ``app/ocr/postprocess.py``), used by the Spark
Arrow-batch UDFs. The single-process oracle (``pdf_ocr_spark.oracle``)
re-implements the same semantics as straight loops, mirroring the reference's
control flow; equality tests compare the two.

Operates on parallel arrays per page: ``texts`` (list[str]), ``boxes``
(float ndarray (n, 4, 2) corner points), ``confs`` (float ndarray (n,)).

Pinned byte-level semantics (each has a unit test):
  * reading-order sort: stable by (y_min, x_min)      postprocess.py:92
  * same-row merge: y-overlap vs the *group head* > 0.5, members sorted by
    first-corner x, texts joined " ", conf = mean     postprocess.py:167-252
  * paragraph rebuild: gap > avg_height*1.5 or paragraph-start pattern;
    texts joined "" (no separator)                    postprocess.py:254-313
  * header/footer: strip()-ed first/last paragraph repeated on >= 3 pages
                                                      postprocess.py:315-359
  * margin filter incl. bottom-15% page-number kill   postprocess.py:126-165
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

PAGE_NUMBER_RX = re.compile(r"^\s*[\-－]?\s*\d+\s*[\-－]?\s*$")
_LIST_PATTERNS = [
    re.compile(r"^\d+[.、）)]"),
    re.compile(r"^[一二三四五六七八九十]+[.、）)]"),
    re.compile(r"^[（(]\d+[）)]"),
    re.compile(r"^[•·▪▸►◆○●■□]"),
]


def geom(boxes: np.ndarray):
    """(x_min, x_max, y_min, y_max, heights) for an (n,4,2) box array."""
    if len(boxes) == 0:
        z = np.empty(0)
        return z, z, z, z, z
    x_min = boxes[:, :, 0].min(axis=1)
    x_max = boxes[:, :, 0].max(axis=1)
    y_min = boxes[:, :, 1].min(axis=1)
    y_max = boxes[:, :, 1].max(axis=1)
    return x_min, x_max, y_min, y_max, y_max - y_min


def sort_reading_order(texts, boxes, confs):
    """Stable sort by (y_min, x_min) — postprocess.py:92, engine.py:76-78."""
    if len(texts) == 0:
        return texts, boxes, confs
    x_min, _, y_min, _, _ = geom(boxes)
    order = np.lexsort((x_min, y_min))  # stable: last key primary
    return ([texts[i] for i in order], boxes[order], confs[order])


def detect_columns(boxes: np.ndarray, img_width: int,
                   min_gap_frac: float = 0.04,
                   n_bins: int = 256) -> list:
    """Column spans via the vertical whitespace-projection profile: bin
    the x-axis, mark bins covered by any box, and treat uncovered runs
    wider than ``min_gap_frac`` * page width (ignoring the outer
    margins) as column separators. Returns [(x_start, x_end), ...]
    left-to-right; a single span means no column structure.

    The reference has no column logic (postprocess.py sorts purely by
    (y, x)); this is an ENGINE ADDITION for multi-column documents,
    off by default so byte-equality with the reference is untouched.
    Standard public technique (whitespace/projection profile analysis,
    e.g. the X-Y cut family)."""
    if len(boxes) == 0 or img_width <= 0:
        return [(0.0, float(img_width))]
    x_min, x_max, _, _, _ = geom(boxes)
    lo = np.clip((x_min / img_width * n_bins).astype(int), 0, n_bins - 1)
    hi = np.clip(np.ceil(x_max / img_width * n_bins).astype(int),
                 1, n_bins)
    covered = np.zeros(n_bins, dtype=bool)
    for a, b in zip(lo, hi):
        covered[a:b] = True
    # interior uncovered runs only: clip off the outer margins
    first = int(np.argmax(covered))
    last = n_bins - int(np.argmax(covered[::-1]))
    min_gap_bins = max(1, int(min_gap_frac * n_bins))
    spans = []
    span_start = first
    run = 0
    for i in range(first, last):
        if covered[i]:
            if run >= min_gap_bins:
                spans.append((span_start, i - run))
                span_start = i
            run = 0
        else:
            run += 1
    spans.append((span_start, last))
    scale = img_width / n_bins
    return [(s * scale, e * scale) for s, e in spans]


def sort_reading_order_columns(texts, boxes, confs, img_width,
                               min_gap_frac: float = 0.04):
    """Column-aware reading order: boxes are assigned to the detected
    column containing their x-center and sorted column-major —
    (column, y_min, x_min) — so a two-column page reads left column
    top-to-bottom, then right column, instead of interleaving rows.
    Falls back to the plain (y, x) order when one column is detected."""
    if len(texts) == 0:
        return texts, boxes, confs
    cols = detect_columns(boxes, img_width, min_gap_frac)
    if len(cols) <= 1:
        return sort_reading_order(texts, boxes, confs)
    x_min, x_max, y_min, _, _ = geom(boxes)
    centers = (x_min + x_max) / 2.0
    starts = np.array([s for s, _ in cols])
    col_idx = np.clip(np.searchsorted(starts, centers, side="right") - 1,
                      0, len(cols) - 1)
    order = np.lexsort((x_min, y_min, col_idx))  # last key primary
    return ([texts[i] for i in order], boxes[order], confs[order])


def filter_margins(texts, boxes, confs, width, height,
                   ignore_top=0.0, ignore_bottom=0.0,
                   ignore_left=0.0, ignore_right=0.0):
    """Margin-band filter + bottom-15% page-number kill
    (postprocess.py:126-165). Vectorized center-point predicate."""
    n = len(texts)
    if n == 0 or width <= 0 or height <= 0:
        return texts, boxes, confs
    x_min, x_max, y_min, y_max, _ = geom(boxes)
    px = (x_min + x_max) / 2 / width * 100
    py = (y_min + y_max) / 2 / height * 100
    ignored = np.zeros(n, dtype=bool)
    if ignore_top > 0:
        ignored |= py < ignore_top
    if ignore_bottom > 0:
        ignored |= ~ignored & (py > 100 - ignore_bottom)
    if ignore_left > 0:
        ignored |= ~ignored & (px < ignore_left)
    if ignore_right > 0:
        ignored |= ~ignored & (px > 100 - ignore_right)
    # bottom-15% page-number heuristic applies to not-yet-ignored lines
    bottom = ~ignored & (py > 85)
    for i in np.nonzero(bottom)[0]:
        if PAGE_NUMBER_RX.match(texts[i]):
            ignored[i] = True
    keep = ~ignored
    return ([t for t, k in zip(texts, keep) if k], boxes[keep], confs[keep])


def merge_same_row(texts, boxes, confs):
    """Sequential same-row merge (postprocess.py:167-252).

    The group membership test compares each line against the group *head*
    (the first line of the current group), exactly like the reference — this
    forces a sequential scan; the geometry math is numpy.
    """
    n = len(texts)
    if n == 0:
        return [], np.empty((0, 4, 2)), np.empty(0)
    _, _, y_min, y_max, heights = geom(boxes)

    out_texts, out_boxes, out_confs = [], [], []
    group = [0]
    head = 0

    def _flush(members):
        first_x = boxes[members, 0, 0]  # first corner x, postprocess.py:231
        order = np.argsort(first_x, kind="stable")
        m = [members[i] for i in order]
        merged_text = " ".join(texts[i] for i in m)
        pts = boxes[m].reshape(-1, 2)
        x0, y0 = pts[:, 0].min(), pts[:, 1].min()
        x1, y1 = pts[:, 0].max(), pts[:, 1].max()
        out_texts.append(merged_text)
        out_boxes.append([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        out_confs.append(float(confs[m].mean()))

    for i in range(1, n):
        o_start = max(y_min[head], y_min[i])
        o_end = min(y_max[head], y_max[i])
        min_h = min(heights[head], heights[i])
        overlap = 0.0
        if o_end > o_start and min_h > 0:
            overlap = (o_end - o_start) / min_h
        if overlap > 0.5:
            group.append(i)
        else:
            _flush(group)
            group = [i]
            head = i
    _flush(group)
    return out_texts, np.array(out_boxes, dtype=float), \
        np.array(out_confs, dtype=float)


def is_paragraph_start(text: str) -> bool:
    """Indent or list-marker paragraph-start test (postprocess.py:291-308)."""
    if text.startswith("    ") or text.startswith("\t"):
        return True
    stripped = text.strip()
    return any(p.match(stripped) for p in _LIST_PATTERNS)


@dataclass
class Para:
    text: str
    line_confs: list = field(default_factory=list)

    @property
    def avg_confidence(self) -> float:
        if not self.line_confs:
            return 0.0
        return sum(self.line_confs) / len(self.line_confs)


def rebuild_paragraphs(texts, boxes, confs, threshold: float = 1.5):
    """Vectorized paragraph segmentation (postprocess.py:254-313).

    Boundary vector: gap(i) = y_min[i] - y_max[i-1] > avg_height*threshold
    OR paragraph-start(text[i]); groups via cumsum; texts joined with ""
    (no separator — postprocess.py:312).
    """
    n = len(texts)
    if n == 0:
        return []
    _, _, y_min, y_max, heights = geom(boxes)
    avg_height = float(heights.mean())
    gaps = y_min[1:] - y_max[:-1]
    starts = np.fromiter(
        (is_paragraph_start(t) for t in texts[1:]), dtype=bool, count=n - 1
    )
    boundary = np.concatenate(
        [[True], (gaps > avg_height * threshold) | starts]
    )
    # one pass over the boundary positions: slicing between consecutive
    # boundaries regroups in O(n) — the per-group np.nonzero scan this
    # replaces was O(n_lines x n_paragraphs), quadratic on list-heavy
    # pages where most lines start a paragraph (review)
    bounds = np.nonzero(boundary)[0]
    ends = np.append(bounds[1:], n)
    return [
        Para(text="".join(texts[s:e]),
             line_confs=[float(c) for c in confs[s:e]])
        for s, e in zip(bounds, ends)
    ]


@dataclass
class PageParas:
    """Per-page paragraph set (the reference's ProcessedPage,
    postprocess.py:28-44)."""
    page_num: int
    paragraphs: list  # list[Para]
    header: str | None = None
    footer: str | None = None

    @property
    def text(self) -> str:
        return "\n\n".join(p.text for p in self.paragraphs)

    @property
    def avg_confidence(self) -> float:
        """Mean-of-means, not flat mean (postprocess.py:41-44)."""
        if not self.paragraphs:
            return 0.0
        return sum(p.avg_confidence for p in self.paragraphs) \
            / len(self.paragraphs)


def remove_headers_footers(pages: list, repeat_threshold: int = 3) -> list:
    """Cross-page header/footer strip (postprocess.py:315-359).

    Group-by + having over strip()-ed first/last paragraph texts; any value
    on >= repeat_threshold pages is stripped from each page's first/last
    slot, recorded into page.header/footer. Mutates and returns ``pages``.
    """
    if len(pages) < repeat_threshold:
        return pages
    firsts = [p.paragraphs[0].text.strip() for p in pages if p.paragraphs]
    lasts = [p.paragraphs[-1].text.strip() for p in pages if p.paragraphs]
    from collections import Counter
    headers = {t for t, c in Counter(firsts).items()
               if c >= repeat_threshold}
    footers = {t for t, c in Counter(lasts).items()
               if c >= repeat_threshold}
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


def process_page(texts, boxes, confs, page_num: int = 0,
                 img_width: int = 0, img_height: int = 0,
                 ignore_top=0.0, ignore_bottom=0.0, ignore_left=0.0,
                 ignore_right=0.0, spacing_threshold: float = 1.5,
                 column_aware: bool = False) -> PageParas:
    """Full single-page chain (postprocess.py:75-103): margins -> sort ->
    merge -> paragraphs. ``column_aware=True`` switches the ordering to
    column-major (engine addition; default False preserves the
    reference's exact (y, x) order and byte-equality)."""
    if any([ignore_top, ignore_bottom, ignore_left, ignore_right]):
        texts, boxes, confs = filter_margins(
            texts, boxes, confs, img_width, img_height,
            ignore_top, ignore_bottom, ignore_left, ignore_right)
    if column_aware:
        texts, boxes, confs = sort_reading_order_columns(
            texts, boxes, confs, img_width)
    else:
        texts, boxes, confs = sort_reading_order(texts, boxes, confs)
    m_texts, m_boxes, m_confs = merge_same_row(texts, boxes, confs)
    paras = rebuild_paragraphs(m_texts, m_boxes, m_confs, spacing_threshold)
    return PageParas(page_num=page_num, paragraphs=paras)


def format_text(text: str) -> str:
    """Optional text normalization (postprocess.py:375-401). NOTE: dead code
    in the reference's orchestration path — provided as an optional column
    function, excluded from the byte-equality path."""
    text = re.sub(r"([，。！？；：、])(\s+)", r"\1", text)
    text = re.sub(r"([,.:;!?])([a-zA-Z])", r"\1 \2", text)
    text = re.sub(r" +", " ", text)
    # the reference's corrections dict has a duplicate key 囗 (postprocess.py
    # :392-397); the later entry wins in a Python dict literal, so the
    # effective mapping is 囗→□
    for wrong, right in (("囗", "□"), ("〇", "○"), ("―", "—")):
        text = text.replace(wrong, right)
    return text.strip()
