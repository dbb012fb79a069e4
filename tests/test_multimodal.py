"""Multimodal binary-column plumbing (deterministic raw codec + stubs)."""

import numpy as np
import pytest

from pdf_ocr_spark import multimodal as mm


def _fake_media_rows(n=6):
    rows = []
    for i in range(n):
        h, w = 16 + i, 24 + i
        img = ((np.arange(h * w).reshape(h, w) * (i + 1)) % 256) \
            .astype(np.uint8)
        rows.append((i, "image/raw", bytearray(mm.encode_rawg(img)), w, h))
    # one row with an unsupported codec
    rows.append((99, "image/png", bytearray(b"\x89PNG fake"), 10, 10))
    return rows


def test_rawg_roundtrip():
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert (mm.decode_media(mm.encode_rawg(img), "image/raw") == img).all()


def test_unsupported_codec_raises():
    # without Pillow the codec is a documented stub; with Pillow the fake
    # bytes are a decode error — either way decode_media raises and the
    # UDF contains it as an error row
    with pytest.raises(NotImplementedError if mm._PILImage is None
                       else Exception):
        mm.decode_media(b"\x89PNG...", "image/png")


@pytest.mark.skipif(mm._PILImage is None,
                    reason="Pillow not available in this container")
def test_pillow_codec_roundtrip():
    import io
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    buf = io.BytesIO()
    mm._PILImage.fromarray(img).save(buf, format="PNG")
    assert (mm.decode_media(buf.getvalue(), "image/png") == img).all()


def test_corrupt_rawg_contained_as_error_row(spark):
    # truncated RAWG header: reshape fails inside decode — must become an
    # error row, never a task failure
    rows = [(1, "image/raw", bytearray(b"RAWG\x00\x10\x00\x10abc"), 16, 16)]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.extract_media_features(df).collect()
    assert len(out) == 1
    assert out[0]["error"] and out[0]["mean_intensity"] is None


def test_resize_block_mean():
    img = np.full((32, 32), 100, dtype=np.uint8)
    out = mm.resize_block_mean(img, 8, 8)
    assert out.shape == (8, 8)
    assert (out == 100).all()


def test_frame_sampling():
    assert mm.frame_sample_indices(3, 8) == [0, 1, 2]
    idx = mm.frame_sample_indices(1000, 5)
    assert idx[0] == 0 and idx[-1] == 999 and len(idx) == 5


def test_feature_extraction_spark(spark):
    df = spark.createDataFrame(_fake_media_rows(), schema=mm.MEDIA_SCHEMA)
    feats = mm.extract_media_features(df.repartition(3)).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id) == 7
    ok = by_id[0]
    assert ok["error"] is None
    assert 0 <= ok["mean_intensity"] <= 255
    assert len(ok["histogram8"]) == 8
    assert abs(sum(ok["histogram8"]) - 1.0) < 1e-9
    thumb = mm.decode_media(bytes(ok["thumb"]), "image/raw")
    assert thumb.shape == (8, 8)
    # the unsupported codec is contained as an error row
    bad = by_id[99]
    assert bad["error"] and bad["mean_intensity"] is None


def test_frame_sample_single_and_zero():
    import pdf_ocr_spark.multimodal as mm
    assert mm.frame_sample_indices(100, 1) == [49]  # middle frame
    assert mm.frame_sample_indices(100, 0) == []
    assert mm.frame_sample_indices(1, 1) == [0]
