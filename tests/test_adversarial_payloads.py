"""Error containment for adversarial/corrupt payloads: every malformed
input must yield an error ROW (on both implementations identically), never
an exception that would kill a Spark task."""

import base64
import zlib

import pytest

from pdf_ocr_spark import oracle
from pdf_ocr_spark.extract import _extract_pdf_doc
from pdf_ocr_spark.config import DEFAULT
from pdf_ocr_spark.minipdf import ImagePage, ScanLine, build_pdf


def _b64(data: bytes) -> str:
    return base64.b64encode(data).decode()


ADVERSARIAL = [
    # %PDF magic, garbage body
    _b64(b"%PDF-1.4\ngarbage garbage"),
    # valid header, truncated mid-object
    _b64(b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog"),
    # stream with /Length lying past EOF
    _b64(b"%PDF-1.4\n1 0 obj\n<< /Length 99999 >>\nstream\nxx\nendstream"),
    # valid structure but corrupted Flate image bytes
    None,  # filled below
    # no pages object
    _b64(b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"),
]


def _corrupt_flate_payload() -> str:
    data = bytearray(build_pdf([ImagePage(
        lines=[ScanLine(x=20, y=40, size=12, text="ok")])]))
    # corrupt bytes inside the Flate stream
    at = bytes(data).index(b"stream\n") + 10
    for i in range(at, at + 16):
        data[i] ^= 0xFF
    return _b64(bytes(data))


ADVERSARIAL[3] = _corrupt_flate_payload()


@pytest.mark.parametrize("payload", ADVERSARIAL)
def test_both_sides_contain_and_agree(payload):
    r = oracle.extract_turn(payload)
    text, spans, method, conf, n_pages, err = _extract_pdf_doc(
        payload, DEFAULT)
    # contained: no exception, both error rows (or both succeed if the
    # parser tolerates the corruption), and byte-identical either way
    assert r.extracted_text == text
    assert r.method == method
    if method == "error":
        assert err and r.error
        assert conf == 0.0 and r.confidence == 0.0


def test_oversized_payload_rejected_without_decode():
    """Reference S1 size limit (app/config.py:87, 100 MB): an oversized
    payload is rejected as an error row on both paths — and from the
    base64 LENGTH, before allocating decoded bytes (a hostile 1 GB
    payload must cost O(1) at 10^12-turn scale)."""
    import dataclasses
    from pdf_ocr_spark.detector import decode_pdf_payload
    cfg = dataclasses.replace(DEFAULT, max_payload_bytes=1024)
    payload = "JVBERi0" + "A" * 4000  # ~3 KB decoded > 1 KB limit
    with pytest.raises(ValueError, match="max size"):
        decode_pdf_payload(payload, cfg.max_payload_bytes)
    r = oracle.extract_turn(payload, cfg)
    text, spans, method, conf, n_pages, err = _extract_pdf_doc(payload, cfg)
    assert r.method == method == "error"
    assert "max size" in err and "max size" in r.error
    assert r.extracted_text == text == ""
    # a payload under the limit still decodes (magic check path)
    small_cfg = dataclasses.replace(DEFAULT, max_payload_bytes=10 ** 6)
    small = base64.b64encode(b"%PDF-1.4\nminimal").decode()
    assert decode_pdf_payload(small, small_cfg.max_payload_bytes) \
        .startswith(b"%PDF")


def test_mime_wrapped_payload_near_limit_not_falsely_rejected():
    """b64decode ignores whitespace, so the cheap size estimate must too:
    a MIME line-wrapped payload whose RAW length exceeds the limit but
    whose alphabet length does not must decode (reference checks the
    actual decoded size, file_manager.py:60-96)."""
    from pdf_ocr_spark.detector import decode_pdf_payload
    raw = b"%PDF-1.4\n" + b"x" * 700  # ~708 bytes decoded
    b64 = base64.b64encode(raw).decode()        # ~948 chars
    wrapped = "\n".join(b64[i:i + 76] for i in range(0, len(b64), 76))
    limit = 710
    assert len(wrapped) * 3 // 4 > limit        # naive estimate rejects
    assert decode_pdf_payload(wrapped, limit).startswith(b"%PDF")
    # ...but genuinely oversized still rejected even when wrapped
    with pytest.raises(ValueError, match="max size"):
        decode_pdf_payload(wrapped, 600)


def test_engine_backend_explicit_mismatch_raises():
    import pdf_ocr_spark.ocr.engine as em
    old_e, old_b = em._ENGINE, em._ENGINE_BACKEND
    try:
        em._ENGINE, em._ENGINE_BACKEND = None, None
        em.get_engine("deterministic")
        with pytest.raises(RuntimeError, match="already initialized"):
            em.get_engine("paddle")
        # implicit calls still return the cached engine
        assert em.get_engine() is em._ENGINE
    finally:
        em._ENGINE, em._ENGINE_BACKEND = old_e, old_b


def test_zlib_error_is_contained():
    # direct check that the corrupted Flate payload doesn't raise
    payload = _corrupt_flate_payload()
    text, spans, method, conf, n_pages, err = _extract_pdf_doc(
        payload, DEFAULT)
    assert method == "error"
    assert "Error" in err or "error" in err


def test_adversarial_through_spark(spark, tmp_path):
    """The full pipeline survives a table of only corrupt payloads."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime
    rows = {
        "conv_id": [f"adv-{i}" for i in range(len(ADVERSARIAL))],
        "turn_idx": list(range(len(ADVERSARIAL))),
        "role": ["user"] * len(ADVERSARIAL),
        "text": ADVERSARIAL,
        "tool": [""] * len(ADVERSARIAL),
        "ts": [datetime(2026, 1, 1)] * len(ADVERSARIAL),
    }
    path = str(tmp_path / "adv.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array(rows["conv_id"]),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": pa.array(rows["role"]),
        "text": pa.array(rows["text"]),
        "tool": pa.array(rows["tool"]),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
    }), path)
    from pdf_ocr_spark.pipeline import run_extraction
    m = run_extraction(spark, path, str(tmp_path / "out"),
                       str(tmp_path / "lin"), run_id="adv",
                       num_buckets=4, num_partitions=4, resume=False)
    assert m["rows_out"] == len(ADVERSARIAL)
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert all(r["error"] is not None or r["extracted_text"] != ""
               or r["method"] == "error" for r in out)


# --- hypothesis randomized corruption (r5) ----------------------------------
try:
    from hypothesis import given, settings, strategies as st

    def _valid_pdf_bytes() -> bytes:
        return build_pdf([ImagePage(
            lines=[ScanLine(x=20, y=40, size=12,
                            text="fuzz target line")],
            width=200, height=120)])

    _BASE_PDF = _valid_pdf_bytes()

    # flips start at byte 6: corrupting the %PDF- magic changes the
    # base64 "JVBERi" prefix, so the turn legitimately routes PLAIN
    # (extract_turn) while _extract_pdf_doc is the pdf-path function —
    # an apples-to-oranges comparison, not a containment bug
    @settings(max_examples=100, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(6, len(_BASE_PDF) - 1),
                  st.integers(1, 255)),
        min_size=1, max_size=8))
    def test_random_byte_flips_are_contained_and_engines_agree(flips):
        """Randomized corruption of a VALID pdf (1-8 xor byte flips at
        arbitrary offsets): both implementations must contain the
        damage (error row or tolerated parse — never an exception that
        would kill a Spark task) and stay byte-identical to each
        other."""
        data = bytearray(_BASE_PDF)
        for pos, x in flips:
            data[pos] ^= x
        payload = _b64(bytes(data))
        r = oracle.extract_turn(payload)
        text, spans, method, conf, n_pages, err = _extract_pdf_doc(
            payload, DEFAULT)
        assert r.extracted_text == text
        assert r.method == method
        if method == "error":
            assert err and r.error
except ImportError:  # pragma: no cover
    pass
