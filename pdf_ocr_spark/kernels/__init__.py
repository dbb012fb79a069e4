"""Image preprocessing kernels (pure numpy).

Re-implementations of the reference's OpenCV-backed preprocess operators
(SmartPDF-OCR ``app/preprocess/``): same string-dispatched method registry,
same parameters, numpy instead of cv2 (cv2 is not available here, and the
kernels run inside Arrow-batch UDFs on numpy arrays either way).
"""

from .denoise import denoise
from .binarize import binarize
from .deskew import deskew, detect_skew_angle, rotate_image

__all__ = ["denoise", "binarize", "deskew", "detect_skew_angle",
           "rotate_image"]
