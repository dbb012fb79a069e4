"""Skew detection and correction. Reference: SmartPDF-OCR
``app/preprocess/deskew.py``.

Method registry mirrors deskew.py:161-189 (hough default, projection,
minarea); the search range is the reference's +/-15 degrees in 0.5-degree
steps (projection, deskew.py:76-121). ``deskew`` is a no-op below 0.1 degrees
(deskew.py:239-264). ``rotate_image`` expands the canvas to fit, constant
white border (deskew.py:192-236).

Conventions (matched to the reference, deskew.py:239-264): detectors return
a positive angle when the text appears tilted *clockwise* on screen (lines
sloping down-to-the-right in image coordinates — the sign of the reference's
``arctan2(y2-y1, x2-x1)``, deskew.py:63); ``rotate_image(img, +a)`` rotates
*counter-clockwise* on screen (cv2.getRotationMatrix2D convention,
deskew.py:215); so ``deskew`` corrects by rotating by ``+detected_angle``,
exactly like the reference (deskew.py:262).
"""

from __future__ import annotations

import numpy as np

from .binarize import otsu_binarize

_MAX_ANGLE = 15.0
_STEP = 0.5


def _ink_points(img: np.ndarray, cap: int = 20000) -> np.ndarray:
    binary = otsu_binarize(img)
    ys, xs = np.nonzero(binary == 0)
    if len(ys) == 0:
        return np.empty((0, 2))
    if len(ys) > cap:
        idx = np.linspace(0, len(ys) - 1, cap).astype(int)
        ys, xs = ys[idx], xs[idx]
    return np.stack([ys, xs], axis=1).astype(np.float64)


def projection_skew(img: np.ndarray) -> float:
    """Maximize horizontal-projection variance over +/-15 deg in 0.5 steps
    (reference deskew.py:76-121)."""
    pts = _ink_points(img)
    if len(pts) < 10:
        return 0.0
    ys, xs = pts[:, 0], pts[:, 1]
    best_angle, best_var = 0.0, -1.0
    for angle in np.arange(-_MAX_ANGLE, _MAX_ANGLE + _STEP / 2, _STEP):
        t = np.deg2rad(angle)
        yp = ys * np.cos(t) - xs * np.sin(t)
        yb = np.floor(yp - yp.min()).astype(int)
        counts = np.bincount(yb)
        var = counts.var()
        if var > best_var:
            best_var, best_angle = var, float(angle)
    return best_angle


def hough_skew(img: np.ndarray) -> float:
    """Median angle of dominant near-horizontal Hough lines
    (reference deskew.py:18-73 uses Canny+HoughLinesP; here: gradient edges
    + a standard Hough accumulator restricted to +/-15 deg line angles).

    Angle estimation is scale-invariant, so large pages are strided down
    to ~1000 px before the gradient — at dpi-300 page size this cuts the
    kernel ~6x (profiled: deskew was 62% of whole-document decode) with
    no loss at the 0.5-degree step resolution."""
    stride = -(-min(img.shape[:2]) // 1000)  # ceil: result <= ~1000 px
    if stride > 1:
        img = img[::stride, ::stride]
    g = img.astype(np.float32)
    if g.ndim == 3:
        g = g.mean(axis=2)
    gy = np.abs(np.diff(g, axis=0, prepend=g[:1]))
    gx = np.abs(np.diff(g, axis=1, prepend=g[:, :1]))
    mag = gx + gy
    thresh = max(mag.mean() * 4, 40.0)
    ys, xs = np.nonzero(mag > thresh)
    if len(ys) < 20:
        return 0.0
    if len(ys) > 15000:
        idx = np.linspace(0, len(ys) - 1, 15000).astype(int)
        ys, xs = ys[idx], xs[idx]
    angles = np.arange(-_MAX_ANGLE, _MAX_ANGLE + _STEP / 2, _STEP)
    diag = int(np.hypot(*img.shape[:2])) + 1
    votes = np.empty(len(angles))
    for i, a in enumerate(angles):
        # line angle a => normal angle a+90; rho = x*cos(n) + y*sin(n)
        t = np.deg2rad(a + 90.0)
        rho = xs * np.cos(t) + ys * np.sin(t)
        counts = np.bincount(
            np.floor(rho + diag).astype(int), minlength=2 * diag
        )
        votes[i] = counts.max()
    # argmax accumulator readout with ties broken toward the smallest
    # |angle| (r3; was median of the top-5 vote angles, which pulled
    # near-tie NEIGHBOR angles into the estimate and reported +-0.5 deg
    # on perfectly clean scans — every clean page then paid a ~37 ms
    # nearest-neighbor rotation AND its interpolation damage before OCR.
    # The reference medians per-SEGMENT angles of HoughLinesP output
    # (deskew.py:58-69), where a clean page yields all-horizontal
    # segments and a 0.0 estimate; accumulator argmax is the standard
    # readout with the same clean-page behavior: measured votes 197 at
    # 0.0 vs 134 runner-up on a clean scan, 153 at the true angle on a
    # 2.5-deg skew)
    best = np.flatnonzero(votes == votes.max())
    return float(angles[best[np.argmin(np.abs(angles[best]))]])


def minarea_skew(img: np.ndarray) -> float:
    """Principal-axis orientation of ink points folded to +/-45 deg
    (reference deskew.py:124-158 uses cv2.minAreaRect; PCA is the numpy
    analog for axis-aligned text blocks)."""
    pts = _ink_points(img)
    if len(pts) < 10:
        return 0.0
    centered = pts - pts.mean(axis=0)
    cov = centered.T @ centered / len(centered)
    evals, evecs = np.linalg.eigh(cov)
    main = evecs[:, int(np.argmax(evals))]  # (dy, dx)
    angle = np.rad2deg(np.arctan2(main[0], main[1]))
    while angle > 45:
        angle -= 90
    while angle < -45:
        angle += 90
    # principal axis of CW-tilted text slopes down-right (dy, dx same sign)
    # => positive angle, matching the hough/projection sign convention
    return float(angle)


_METHODS = {
    "hough": hough_skew,
    "projection": projection_skew,
    "minarea": minarea_skew,
}


def detect_skew_angle(img: np.ndarray, method: str = "hough") -> float:
    """String-dispatched skew detection (reference deskew.py:161-189)."""
    fn = _METHODS.get(method)
    if fn is None:
        raise ValueError(f"unknown skew method: {method}")
    return fn(img)


def rotate_image(img: np.ndarray, angle_deg: float,
                 bg: int = 255) -> np.ndarray:
    """Rotate by angle (positive = counter-clockwise on screen, the
    cv2.getRotationMatrix2D convention the reference uses,
    deskew.py:192-236) with canvas expansion and constant border.
    Nearest-neighbor sampling."""
    h, w = img.shape[:2]
    t = np.deg2rad(-angle_deg)  # y-down screen coords: negate for CCW
    cos_a, sin_a = abs(np.cos(t)), abs(np.sin(t))
    new_w = int(np.ceil(w * cos_a + h * sin_a))
    new_h = int(np.ceil(w * sin_a + h * cos_a))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ncy, ncx = (new_h - 1) / 2.0, (new_w - 1) / 2.0
    # float32 grids: half the DRAM traffic of float64 on page-sized images
    yy = np.arange(new_h, dtype=np.float32)[:, None]
    xx = np.arange(new_w, dtype=np.float32)[None, :]
    cos_t = np.float32(np.cos(t))
    sin_t = np.float32(np.sin(t))
    ys = (yy - np.float32(ncy)) * cos_t - (xx - np.float32(ncx)) * sin_t \
        + np.float32(cy)
    xs = (yy - np.float32(ncy)) * sin_t + (xx - np.float32(ncx)) * cos_t \
        + np.float32(cx)
    ysi = np.rint(ys).astype(np.int32)
    xsi = np.rint(xs).astype(np.int32)
    valid = (ysi >= 0) & (ysi < h) & (xsi >= 0) & (xsi < w)
    # clip + single flat gather + where instead of double boolean
    # fancy-indexing: one contiguous gather over the grid beats two
    # mask-compactions (profiled 39ms -> 25ms on a dpi-150 page)
    np.clip(ysi, 0, h - 1, out=ysi)
    np.clip(xsi, 0, w - 1, out=xsi)
    flat = ysi * np.int32(w) + xsi
    bg_px = np.array(bg, dtype=img.dtype)
    if img.ndim == 3:
        sampled = img.reshape(-1, img.shape[2])[flat]
        return np.where(valid[..., None], sampled, bg_px)
    sampled = img.reshape(-1)[flat]
    return np.where(valid, sampled, bg_px)


def deskew(img: np.ndarray, method: str = "hough") -> tuple:
    """Detect-and-correct; no-op below 0.1 deg. Default method and the
    rotate-by-+angle correction both match the reference
    (deskew.py:239-264: method="hough", rotate_image(image, angle)).

    Returns (corrected_image, detected_angle).
    """
    angle = detect_skew_angle(img, method)
    if abs(angle) < 0.1:
        return img, 0.0
    return rotate_image(img, angle), angle
