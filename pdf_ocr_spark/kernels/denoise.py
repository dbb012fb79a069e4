"""Denoise kernels. Reference: SmartPDF-OCR ``app/preprocess/denoise.py``.

Method registry mirrors denoise.py:107-137 (gaussian default 5x5, median,
bilateral, nlm). All operate on uint8 grayscale or RGB numpy arrays and
return uint8. Implementations are numpy (reflect-101 padding like OpenCV's
default border mode); ``nlm`` is a documented simplification (larger-kernel
gaussian) since true non-local means is not worth the cost in this engine.
"""

from __future__ import annotations

import numpy as np


def _reflect_pad(img: np.ndarray, k: int) -> np.ndarray:
    return np.pad(img, [(k, k)] * 2 + [(0, 0)] * (img.ndim - 2),
                  mode="reflect")


def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    # OpenCV's default sigma for ksize: 0.3*((ksize-1)*0.5 - 1) + 0.8
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _sep_convolve(img: np.ndarray, k1d: np.ndarray) -> np.ndarray:
    """Separable 2-D convolution with reflect padding.

    float32 internally: kernel weights and uint8 inputs fit comfortably in
    single precision, and halving memory traffic matters — at high
    parallelism these page-sized passes are DRAM-bandwidth-bound, not
    FLOP-bound (measured: 32 concurrent workers ran slower than 8 with
    float64 temporaries)."""
    k = len(k1d) // 2
    k1d = k1d.astype(np.float32)
    f = img.astype(np.float32)
    pad = _reflect_pad(f, k)
    # rows
    out = np.zeros_like(f)
    for i, wgt in enumerate(k1d):
        out += wgt * pad[i:i + img.shape[0], k:k + img.shape[1]]
    pad = _reflect_pad(out, k)
    out2 = np.zeros_like(f)
    for j, wgt in enumerate(k1d):
        out2 += wgt * pad[k:k + img.shape[0], j:j + img.shape[1]]
    return out2


_BINOMIAL5 = np.array([1, 4, 6, 4, 1], dtype=np.uint16)  # == cv2 5-tap


def _binomial5_blur(img: np.ndarray) -> np.ndarray:
    """Exact cv2 GaussianBlur(img,(5,5),0) kernel ([1,4,6,4,1]/16 per
    axis — OpenCV hardcodes the binomial for small ksize with sigma=0),
    in uint16 fixed point: half the DRAM traffic of a float path, and the
    decode stage is bandwidth-bound at high parallelism."""
    k = 2
    h, w = img.shape[:2]
    pad = _reflect_pad(img, k).astype(np.uint16)
    rows = np.zeros(
        (h, w + 2 * k) + img.shape[2:], dtype=np.uint16)
    for i, wgt in enumerate(_BINOMIAL5):
        rows += wgt * pad[i:i + h]
    out = np.zeros((h, w) + img.shape[2:], dtype=np.uint16)
    for j, wgt in enumerate(_BINOMIAL5):
        out += wgt * rows[:, j:j + w]
    return ((out + 128) >> 8).astype(np.uint8)


def gaussian_denoise(img: np.ndarray, ksize: int = 5) -> np.ndarray:
    """5x5 Gaussian blur (reference denoise.py:11-30)."""
    if ksize == 5:
        return _binomial5_blur(img)
    out = _sep_convolve(img, _gaussian_kernel1d(ksize))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def median_denoise(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    """3x3 median filter (reference denoise.py:33-51)."""
    k = ksize // 2
    pad = _reflect_pad(img, k)
    h, w = img.shape[:2]
    stack = [
        pad[dy:dy + h, dx:dx + w]
        for dy in range(ksize) for dx in range(ksize)
    ]
    return np.median(np.stack(stack), axis=0).astype(np.uint8)


def bilateral_denoise(img: np.ndarray, d: int = 5, sigma_color: float = 75.0,
                      sigma_space: float = 75.0) -> np.ndarray:
    """Small-window bilateral filter (reference denoise.py:54-73)."""
    k = d // 2
    f = img.astype(np.float64)
    pad = _reflect_pad(f, k)
    h, w = img.shape[:2]
    num = np.zeros_like(f)
    den = np.zeros_like(f)
    for dy in range(d):
        for dx in range(d):
            shifted = pad[dy:dy + h, dx:dx + w]
            gs = np.exp(-((dy - k) ** 2 + (dx - k) ** 2)
                        / (2 * sigma_space ** 2))
            gc = np.exp(-((shifted - f) ** 2) / (2 * sigma_color ** 2))
            wgt = gs * gc
            num += wgt * shifted
            den += wgt
    return np.clip(np.rint(num / np.maximum(den, 1e-12)), 0, 255) \
        .astype(np.uint8)


def nlm_denoise(img: np.ndarray) -> np.ndarray:
    """Simplified stand-in for fastNlMeans (reference denoise.py:76-104):
    a 7x7 gaussian — true NLM is out of scope without cv2."""
    return gaussian_denoise(img, ksize=7)


_METHODS = {
    "gaussian": gaussian_denoise,
    "median": median_denoise,
    "bilateral": bilateral_denoise,
    "nlm": nlm_denoise,
}


def denoise(img: np.ndarray, method: str = "gaussian") -> np.ndarray:
    """String-dispatched denoise (reference denoise.py:107-137)."""
    fn = _METHODS.get(method)
    if fn is None:
        raise ValueError(f"unknown denoise method: {method}")
    return fn(img)
