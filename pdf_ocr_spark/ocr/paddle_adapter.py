"""PaddleOCR adapter: mounts the real reference backend into the engine slot.

Implements the same engine contract as ``DeterministicOCREngine``
(``warmup() / recognize(image, page_num) -> OCRResult / recognize_batch /
get_text_only``) by wrapping PaddleOCR exactly the way the reference does
(SmartPDF-OCR ``app/ocr/engine.py:81-241``):

- lazy singleton init with GPU -> CPU auto-fallback and TensorRT gating
  (engine.py:119-151: paddle.device.is_compiled_with_cuda() probe, fallback
  on set_device failure, tensorrt forced off without GPU)
- warmup with a dummy 100x100 inference (engine.py:153-165)
- result parsing of Paddle's ``[box, (text, conf)]`` items into OCRLine and
  an OCRResult sorted by (y_min, x_min) (engine.py:184-206)

PaddleOCR is not installed in this container, so the import is guarded:
``PaddleOCRAdapter`` raises a clear error when constructed without paddle
unless an ``ocr_impl`` is injected (which is also how the interface-contract
test drives the parser with reference-shaped fake output). On a real
cluster, per-executor mounting follows the same pattern as the
deterministic engine: ``get_engine(backend="paddle")`` caches one adapter
per Python worker process, reused across Arrow batches.
"""

from __future__ import annotations

import numpy as np

from .engine import OCRLine, OCRResult

try:  # pragma: no cover - paddle not in this sandbox
    from paddleocr import PaddleOCR as _PaddleOCR
except ImportError:
    _PaddleOCR = None


class PaddleOCRAdapter:
    """Engine-contract adapter around PaddleOCR.

    Parameters mirror the reference constructor (engine.py:93-117);
    ``ocr_impl`` injects a ready OCR object (tests, or a pre-built
    PaddleOCR with custom flags) and skips paddle entirely.
    """

    def __init__(self, lang: str = "ch", use_angle_cls: bool = True,
                 use_gpu: bool = False, use_tensorrt: bool = False,
                 ocr_impl=None):
        self.lang = lang
        self.use_angle_cls = use_angle_cls
        self.use_gpu = use_gpu
        self.use_tensorrt = use_tensorrt
        self._ocr = ocr_impl
        if self._ocr is None:
            self._init_ocr()

    def _init_ocr(self) -> None:
        if _PaddleOCR is None:
            raise ImportError(
                "paddleocr is not installed; install paddlepaddle + "
                "paddleocr on the executors or inject ocr_impl")
        import paddle  # pragma: no cover - requires paddle

        # GPU -> CPU auto-fallback (reference engine.py:124-140)
        if self.use_gpu:
            if not paddle.device.is_compiled_with_cuda():
                self.use_gpu = False
                self.use_tensorrt = False
            else:
                try:
                    paddle.device.set_device("gpu")
                except Exception:
                    self.use_gpu = False
                    self.use_tensorrt = False
        if not self.use_gpu:
            self.use_tensorrt = False

        self._ocr = _PaddleOCR(
            use_angle_cls=self.use_angle_cls, lang=self.lang,
            use_gpu=self.use_gpu, use_tensorrt=self.use_tensorrt,
            show_log=False)

    # --- engine contract --------------------------------------------------
    def warmup(self) -> None:
        """Dummy 100x100 inference (reference engine.py:153-165); warmup
        failures are swallowed like the reference's try/except."""
        try:
            dummy = np.zeros((100, 100, 3), dtype=np.uint8)
            self._ocr.ocr(dummy, cls=self.use_angle_cls)
        except Exception:
            pass

    def recognize(self, image: np.ndarray, page_num: int = 0) -> OCRResult:
        """Parse Paddle output ``result[0] = [[box, (text, conf)], ...]``
        into OCRLines; sort by (y_min, x_min) (reference engine.py:167-207)."""
        raw = self._ocr.ocr(image, cls=self.use_angle_cls)
        lines = []
        if raw and raw[0]:
            for item in raw[0]:
                box = [[float(x), float(y)] for x, y in item[0]]
                text, confidence = item[1][0], float(item[1][1])
                lines.append(OCRLine(text=text, confidence=confidence,
                                     box=box))
        result = OCRResult(page_num=page_num, lines=lines,
                           img_width=image.shape[1],
                           img_height=image.shape[0])
        result.sort_by_position()
        return result

    def recognize_batch(self, images: list, start_page: int = 0) -> list:
        """Serial loop (reference engine.py:209-228); Spark parallelism
        comes from partitions, not threads."""
        return [self.recognize(img, page_num=start_page + i)
                for i, img in enumerate(images)]

    def get_text_only(self, image: np.ndarray) -> str:
        return self.recognize(image).text
