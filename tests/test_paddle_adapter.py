"""PaddleOCR adapter interface contract.

Drives the adapter with a fake OCR impl producing the exact raw shape the
reference parses (``result[0] = [[box, (text, conf)], ...]``, SmartPDF-OCR
app/ocr/engine.py:184-197) and asserts the adapter is slot-compatible with
the deterministic engine: same OCRResult surface, same (y_min, x_min)
ordering, same empty-result behavior.
"""

import numpy as np
import pytest

from pdf_ocr_spark.ocr.engine import DeterministicOCREngine, OCRResult
from pdf_ocr_spark.ocr.paddle_adapter import PaddleOCRAdapter


class FakePaddle:
    """Reference-shaped output: two lines deliberately out of reading
    order, plus numpy scalars (Paddle returns np.float32 confidences)."""

    def __init__(self, raw=None):
        self.calls = []
        self.raw = raw

    def ocr(self, image, cls=True):
        self.calls.append((image.shape, cls))
        if self.raw is not None:
            return self.raw
        return [[
            [[[10.0, 50.0], [90.0, 50.0], [90.0, 70.0], [10.0, 70.0]],
             ("second line", np.float32(0.91))],
            [[[10.0, 10.0], [80.0, 10.0], [80.0, 30.0], [10.0, 30.0]],
             ("first line", np.float32(0.97))],
        ]]


def _img(h=100, w=120):
    return np.full((h, w, 3), 255, dtype=np.uint8)


def test_parses_reference_shape_and_sorts():
    eng = PaddleOCRAdapter(ocr_impl=FakePaddle())
    res = eng.recognize(_img(), page_num=3)
    assert isinstance(res, OCRResult)
    assert res.page_num == 3
    assert res.img_width == 120 and res.img_height == 100
    # (y_min, x_min) reading order restored (engine.py:205)
    assert [l.text for l in res.lines] == ["first line", "second line"]
    assert res.lines[0].confidence == pytest.approx(0.97)
    assert isinstance(res.lines[0].confidence, float)  # np scalar coerced
    assert res.lines[0].box == [[10.0, 10.0], [80.0, 10.0],
                                [80.0, 30.0], [10.0, 30.0]]
    # derived geometry works on the parsed boxes
    assert res.lines[0].y_min == 10.0 and res.lines[0].height == 20.0


def test_empty_and_none_results():
    # Paddle returns [None] for blank pages, [] on some versions
    for raw in ([None], [], [[]]):
        eng = PaddleOCRAdapter(ocr_impl=FakePaddle(raw=raw))
        res = eng.recognize(_img())
        assert res.lines == []
        assert res.text == ""
        assert res.avg_confidence == 0.0


def test_warmup_runs_dummy_inference_and_swallows_errors():
    fake = FakePaddle()
    PaddleOCRAdapter(ocr_impl=fake).warmup()
    assert fake.calls[0][0] == (100, 100, 3)  # reference engine.py:161

    class Exploding(FakePaddle):
        def ocr(self, image, cls=True):
            raise RuntimeError("model load failed")
    PaddleOCRAdapter(ocr_impl=Exploding()).warmup()  # must not raise


def test_slot_compatibility_with_deterministic_engine():
    """Both engines expose the identical contract the extraction UDF uses
    (extract.py:133: engine.recognize(img, page_num))."""
    det, pad = DeterministicOCREngine(), PaddleOCRAdapter(
        ocr_impl=FakePaddle())
    for eng in (det, pad):
        for name in ("warmup", "recognize", "recognize_batch",
                     "get_text_only"):
            assert callable(getattr(eng, name))
        out = eng.recognize_batch([_img(), _img()], start_page=5)
        assert [r.page_num for r in out] == [5, 6]
        assert isinstance(eng.get_text_only(_img()), str)


def test_constructing_without_paddle_raises_clearly():
    with pytest.raises(ImportError, match="paddleocr"):
        PaddleOCRAdapter()  # no paddle in this container, no ocr_impl


def test_get_engine_backend_dispatch(monkeypatch):
    import pdf_ocr_spark.ocr.engine as em
    monkeypatch.setattr(em, "_ENGINE", None)
    eng = em.get_engine("deterministic")
    assert isinstance(eng, DeterministicOCREngine)
    monkeypatch.setattr(em, "_ENGINE", None)
    with pytest.raises(ValueError, match="unknown OCR backend"):
        em.get_engine("bogus")
