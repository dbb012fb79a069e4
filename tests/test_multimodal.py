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
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG...", "image/png")


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
