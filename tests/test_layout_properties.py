"""Property-based cross-check: the vectorized layout core and the oracle's
loop transcription must agree on arbitrary line geometries, including
degenerate ones (zero heights, identical boxes, empty text)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_ocr_spark import oracle
from pdf_ocr_spark.ocr import layout
from pdf_ocr_spark.ocr.engine import OCRLine, OCRResult


def _box(x0, y0, w, h):
    return [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]


line_st = st.builds(
    lambda x0, y0, w, h, text, conf: OCRLine(text, conf, _box(x0, y0, w, h)),
    x0=st.integers(0, 300).map(float),
    y0=st.integers(0, 400).map(float),
    w=st.integers(0, 150).map(float),
    h=st.integers(0, 40).map(float),
    text=st.text(
        alphabet="ab1. \t•一（)", min_size=0, max_size=8),
    conf=st.floats(0.0, 1.0, allow_nan=False),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(line_st, min_size=0, max_size=12))
def test_process_page_equivalence(lines):
    res = OCRResult(page_num=0, lines=list(lines), img_width=500,
                    img_height=500)
    ref = oracle.ref_process_page(res)
    texts = [l.text for l in lines]
    boxes = np.array([l.box for l in lines], dtype=float) if lines \
        else np.empty((0, 4, 2))
    confs = np.array([l.confidence for l in lines], dtype=float)
    vec = layout.process_page(texts, boxes, confs, page_num=0,
                              img_width=500, img_height=500)
    assert [p.text for p in ref.paragraphs] == \
        [p.text for p in vec.paragraphs]
    ref_c = [round(p.avg_confidence, 12) for p in ref.paragraphs]
    vec_c = [round(p.avg_confidence, 12) for p in vec.paragraphs]
    assert ref_c == vec_c


@settings(max_examples=100, deadline=None)
@given(st.lists(line_st, min_size=0, max_size=10),
       st.floats(0, 10), st.floats(0, 10), st.floats(0, 10),
       st.floats(0, 10))
def test_margin_filter_equivalence(lines, t, b, l, r):
    kept_ref = oracle._ref_filter_margins(list(lines), 500, 500, t, b, l, r)
    texts = [x.text for x in lines]
    boxes = np.array([x.box for x in lines], dtype=float) if lines \
        else np.empty((0, 4, 2))
    confs = np.array([x.confidence for x in lines], dtype=float)
    kept_vec, _, _ = layout.filter_margins(
        texts, boxes, confs, 500, 500, t, b, l, r)
    assert [x.text for x in kept_ref] == kept_vec
