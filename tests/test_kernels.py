"""Direct unit tests for the preprocess kernels (SURVEY §2.3, I4-I8)."""

import numpy as np
import pytest

from pdf_ocr_spark.kernels import (
    binarize, denoise, deskew, detect_skew_angle, rotate_image,
)
from pdf_ocr_spark.kernels.binarize import otsu_threshold


def _noisy_text_image(seed=0):
    rng = np.random.RandomState(seed)
    img = np.full((120, 200), 255, dtype=np.uint8)
    for y in (30, 60, 90):
        img[y:y + 8, 20:180] = 0  # text-like bars
    idx = rng.choice(img.size, 60, replace=False)
    img.flat[idx] = rng.choice([0, 255], 60)
    return img


@pytest.mark.parametrize("method", ["gaussian", "median", "bilateral",
                                    "nlm"])
def test_denoise_methods_shape_dtype(method):
    img = _noisy_text_image()
    out = denoise(img, method)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_denoise_unknown_method():
    with pytest.raises(ValueError):
        denoise(_noisy_text_image(), "bogus")


def test_gaussian_preserves_flat_regions():
    img = np.full((50, 50), 200, dtype=np.uint8)
    assert (denoise(img, "gaussian") == 200).all()


def test_median_removes_salt_pepper():
    img = np.full((50, 50), 255, dtype=np.uint8)
    img[10, 10] = 0  # lone pepper pixel
    assert denoise(img, "median")[10, 10] == 255


@pytest.mark.parametrize("method", ["simple", "otsu", "adaptive",
                                    "sauvola"])
def test_binarize_methods_binary_output(method):
    out = binarize(_noisy_text_image(), method)
    assert set(np.unique(out)) <= {0, 255}


def test_otsu_threshold_separates_bimodal():
    img = np.concatenate([np.full(500, 30, np.uint8),
                          np.full(500, 220, np.uint8)]).reshape(20, 50)
    thr = otsu_threshold(img)
    assert 30 <= thr < 220


def test_rotate_expands_canvas():
    img = np.zeros((100, 200), dtype=np.uint8)
    out = rotate_image(img, 30.0)
    # reference deskew.py:192-236: new dims fit the rotated rect
    assert out.shape[0] >= 100 and out.shape[1] >= 200
    assert out.shape[0] > 140  # 200*sin30 + 100*cos30 ~ 187


def test_rotate_identity():
    img = _noisy_text_image()
    assert (rotate_image(img, 0.0) == img).all()


def test_deskew_noop_below_tenth_degree():
    img = _noisy_text_image()
    out, angle = deskew(img, "projection")
    assert angle == 0.0
    assert out is img  # unchanged object, no-op path


@pytest.mark.parametrize("true_angle", [2.0, -4.0])
def test_projection_detects_skew(true_angle):
    # reference sign contract (deskew.py:63,262): rotate_image(+a) is CCW
    # on screen, detectors report CW-positive => detected == -injected
    img = _noisy_text_image()
    rot = rotate_image(img, true_angle)
    detected = detect_skew_angle(rot, "projection")
    assert abs(detected + true_angle) <= 0.75


@pytest.mark.parametrize("method", ["hough", "projection", "minarea"])
@pytest.mark.parametrize("injected", [3.0, -3.0])
def test_deskew_corrects_all_methods(method, injected):
    """Reference contract deskew.py:239-264: deskew() rotates by +detected
    and must *reduce* the skew regardless of method or direction. This test
    does NOT share the oracle path — it measures residual skew directly."""
    img = _noisy_text_image()
    rot = rotate_image(img, injected)
    corrected, angle = deskew(rot, method)
    assert abs(angle + injected) <= 0.75  # detected == -injected (CW-pos)
    residual = detect_skew_angle(corrected, "projection")
    assert abs(residual) <= 0.5


def test_deskew_default_method_is_hough():
    """Reference deskew() defaults to method='hough' (deskew.py:239-241)."""
    import inspect
    from pdf_ocr_spark.kernels.deskew import deskew as d
    assert inspect.signature(d).parameters["method"].default == "hough"


def test_hough_low_contrast_fidelity_deviation_pinned():
    """Documented numeric-fidelity deviation (COVERAGE §2.3): hough_skew
    uses an ABSOLUTE gradient floor (max(4*mean, 40)), not the reference's
    Canny hysteresis (deskew.py:18-73) whose thresholds adapt to image
    contrast. On a low-contrast scan (ink 235 on 255) the gradient step
    (~20) sits under the floor, so hough finds no edges and returns 0.0 —
    where Canny-based detection could still recover the angle. The
    adaptive-threshold path (projection via Otsu) does recover it. This
    pins the current behavior so any change is a conscious one."""
    def bars(ink):
        im = np.full((120, 200), 255, dtype=np.uint8)
        for y in (30, 60, 90):
            im[y:y + 8, 20:180] = ink
        return im
    low = rotate_image(bars(235), 3.0)
    assert detect_skew_angle(low, "hough") == 0.0       # the deviation
    assert abs(detect_skew_angle(bars(0), "hough")) <= 0.01
    assert abs(detect_skew_angle(rotate_image(bars(0), 3.0), "hough")
               + 3.0) <= 0.75                            # contrast OK
    assert abs(detect_skew_angle(low, "projection") + 3.0) <= 0.75


def test_skew_unknown_method():
    with pytest.raises(ValueError):
        detect_skew_angle(_noisy_text_image(), "bogus")


def test_binomial5_matches_float_kernel_closely():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    from pdf_ocr_spark.kernels.denoise import (
        _gaussian_kernel1d, _sep_convolve,
    )
    a = denoise(img, "gaussian").astype(int)
    b = np.clip(np.rint(_sep_convolve(img, _gaussian_kernel1d(5))), 0,
                255).astype(int)
    assert np.abs(a - b).max() <= 6


def test_to_gray_integer_fast_path_bit_identical():
    """The uint16 fixed-point RGB gray must equal the float64
    rint-mean EXHAUSTIVELY (all 16.7M rgb combos) and leave
    non-3-channel inputs on the float64 path (s/4 can tie at .5)."""
    import numpy as np
    from pdf_ocr_spark.kernels.binarize import to_gray

    r, g, b = np.meshgrid(np.arange(256), np.arange(256),
                          np.arange(256), indexing="ij")
    img = np.stack([r, g, b], axis=-1).astype(np.uint8) \
        .reshape(256, 256 * 256, 3)
    want = np.rint(img.astype(np.float64).mean(axis=2)).astype(np.uint8)
    assert (to_gray(img) == want).all()

    rng = np.random.default_rng(11)
    img4 = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    want4 = np.rint(img4.astype(np.float64).mean(axis=2)).astype(np.uint8)
    assert (to_gray(img4) == want4).all()
    gray2d = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert to_gray(gray2d) is gray2d

    # non-uint8 3-channel inputs must stay on the float64 path: the
    # uint16 sum would truncate floats and wrap values > 65535/3
    imgf = rng.random((8, 8, 3)) * 255.0
    wantf = np.rint(imgf.astype(np.float64).mean(axis=2)).astype(np.uint8)
    assert (to_gray(imgf) == wantf).all()
    img16 = np.full((4, 4, 3), 30000, dtype=np.uint16)
    want16 = np.rint(img16.astype(np.float64).mean(axis=2)) \
        .astype(np.uint8)
    assert (to_gray(img16) == want16).all()


def test_adaptive_gaussian_differs_from_mean():
    """The method knob must be real (it was inert — both variants
    collapsed to the box mean): gaussian-weighted and box-mean local
    thresholds disagree near strong edges, like the reference's
    ADAPTIVE_THRESH_GAUSSIAN_C vs MEAN_C."""
    import numpy as np
    from pdf_ocr_spark.kernels.binarize import adaptive_binarize

    rng = np.random.default_rng(5)
    # full-range noise: many pixels sit near their local mean, where the
    # gaussian-vs-box weighting difference flips the threshold decision
    # (a bimodal image keeps every pixel far from both means and the two
    # variants coincide trivially)
    img = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    ga = adaptive_binarize(img, method="gaussian")
    me = adaptive_binarize(img, method="mean")
    assert set(np.unique(ga)) <= {0, 255}
    assert set(np.unique(me)) <= {0, 255}
    assert (ga != me).any()
    import pytest
    with pytest.raises(ValueError):
        adaptive_binarize(img, method="median")


def test_minipdf_cjk_text_layer_roundtrip():
    """CJK text must survive the searchable-PDF text layer (it was
    latin-1 errors='replace' -> '????'; review r4)."""
    from pdf_ocr_spark.minipdf.reader import MiniPdf
    from pdf_ocr_spark.minipdf.writer import TextPage, TextSpan, build_pdf

    blob = build_pdf([TextPage(spans=[
        TextSpan(x=10, y=380, size=12.0, text="中文文本 latin mix"),
        TextSpan(x=10, y=360, size=24.0, text="ascii line"),
    ])])
    pdf = MiniPdf(blob)
    assert pdf.extract_page_text(0) == "中文文本 latin mix\nascii line"
    # per-span size is honored in the raster (24pt draws taller glyphs)
    img = pdf.render_page(0, dpi=144)
    assert (img < 128).any()
