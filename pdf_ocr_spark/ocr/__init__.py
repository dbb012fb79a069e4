"""OCR core: line/page models, the pluggable deterministic engine, and the
vectorized layout postprocessor."""

from .engine import DeterministicOCREngine, OCRLine, OCRResult, get_engine

__all__ = ["DeterministicOCREngine", "OCRLine", "OCRResult", "get_engine"]
