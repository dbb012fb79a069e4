"""Minimal deterministic PDF writer/reader.

The sandbox has no pdfplumber/PyMuPDF, so this package provides the decode
layer the extraction pipeline needs: a writer that produces real ``%PDF-1.4``
bytes (used only by the fixture generator) and a reader that implements the
subset of behavior the reference gets from pdfplumber/PyMuPDF:

  * page counting           (reference app/core/pdf_renderer.py:195-210)
  * per-page text extract   (reference app/core/pdf_detector.py:155-184)
  * page raster inputs      (reference app/core/pdf_renderer.py:45-95)

Text pages carry real uncompressed content streams with Tm/Tj operators;
image pages carry real FlateDecode grayscale image XObjects rendered with the
deterministic bitmap font at authoring time.
"""

from .writer import ImagePage, ScanLine, TextPage, TextSpan, build_pdf
from .reader import MiniPdf
from .adapters import PdfPlumberReader, PyMuPdfReader, open_pdf

__all__ = [
    "ImagePage", "ScanLine", "TextPage", "TextSpan", "build_pdf", "MiniPdf",
    "PdfPlumberReader", "PyMuPdfReader", "open_pdf",
]
