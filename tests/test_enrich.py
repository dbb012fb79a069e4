"""AI-enrichment skeleton: chunking arithmetic (ported from the reference,
reformatter.py:55-81), per-chunk fallback merge (:200-221), and the Spark
stage plumbing with a deterministic fake LLM."""

import pytest

from pdf_ocr_spark.enrich import (
    ChunkResult, enrich_reformat, merge_chunk_results, split_into_chunks,
)


def test_short_text_single_chunk():
    # reformatter.py:57-58: <= max_chunk_chars -> [text], verbatim
    assert split_into_chunks("a" * 4000) == ["a" * 4000]
    assert split_into_chunks("") == [""]


def test_paragraph_accumulation_with_separator_budget():
    # budget counts len(current)+len(para)+2; current carries a trailing
    # "\n\n" that also consumes budget (reformatter.py:64-66)
    text = "\n\n".join(["p1" * 5, "p2" * 5, "p3" * 5])  # 3 paras of 10
    chunks = split_into_chunks(text, max_chunk_chars=25)
    # para1(10)+2=12 fits; +para2: 12+10+2=24 <= 25 fits;
    # +para3: 24+10+2=36 > 25 -> flush, start new
    assert chunks == ["p1p1p1p1p1\n\np2p2p2p2p2", "p3p3p3p3p3"]


def test_oversized_paragraph_hard_split():
    # reformatter.py:71-74: a paragraph longer than max splits at fixed
    # boundaries; preceding residue flushes first
    text = "small\n\n" + "X" * 25
    chunks = split_into_chunks(text, max_chunk_chars=10)
    assert chunks == ["small", "X" * 10, "X" * 10, "X" * 5]


def test_all_empty_paragraphs_yields_empty_chunks_quirk():
    # Faithful reference quirk (reformatter.py:68-69): the flush guard
    # checks the UNSTRIPPED running chunk, so whitespace-only residue
    # flushes as empty-string chunks. Pinned so the port never "fixes" it.
    text = "\n\n" * 40
    assert split_into_chunks(text, max_chunk_chars=10) == [""] * 8


def test_chunk_invariants_property():
    """Hypothesis: for any text, (a) every chunk fits max_chunk_chars,
    (b) no non-whitespace character is lost (the algorithm only drops
    separator whitespace at chunk boundaries), (c) order is preserved."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=120), max_size=8).map("\n\n".join),
        st.integers(min_value=8, max_value=64))
    def check(text, max_chars):
        chunks = split_into_chunks(text, max_chars)
        if len(text) <= max_chars:
            assert chunks == [text]
            return
        joined = "".join(chunks)
        strip_ws = lambda s: "".join(s.split())
        assert strip_ws(joined) == strip_ws(text)
        for c in chunks:
            assert len(c) <= max_chars

    check()


def test_merge_fallback_semantics():
    results = [
        ChunkResult("orig-a", "fmt-a", True),
        ChunkResult("orig-b", "fmt-b", False, error="timeout"),
        ChunkResult("orig-c", "fmt-c", True),
    ]
    m = merge_chunk_results(results)
    # failed chunk contributes its ORIGINAL (reformatter.py:207-210)
    assert m["formatted"] == "fmt-a\n\norig-b\n\nfmt-c"
    assert m["success"] is False
    assert m["chunks_total"] == 3 and m["chunks_processed"] == 2
    assert m["error"] == "timeout"
    ok = merge_chunk_results([ChunkResult("o", "f", True)])
    assert ok["success"] is True and ok["error"] is None


def test_enrich_stage_spark(spark):
    df = spark.createDataFrame(
        [("c1", 0, "hello\n\nworld"),
         ("c1", 1, "BOOM\n\nfine"),
         ("c2", 0, None)],
        "conv_id string, turn_idx int, extracted_text string")

    def fake_llm(chunk: str) -> ChunkResult:
        if "BOOM" in chunk:
            raise RuntimeError("llm exploded")
        return ChunkResult(chunk, chunk.upper(), True)

    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in enrich_reformat(df, fake_llm,
                                     max_chunk_chars=8).collect()}
    # two chunks, both succeed, formatted joined "\n\n"
    r = rows[("c1", 0)]
    assert r["formatted_text"] == "HELLO\n\nWORLD"
    assert r["ai_success"] and r["chunks_total"] == 2
    # the raising chunk is contained per chunk: original text kept
    r = rows[("c1", 1)]
    assert r["formatted_text"] == "BOOM\n\nFINE"
    assert not r["ai_success"]
    assert r["chunks_processed"] == 1
    assert "RuntimeError" in r["ai_error"]
    # NULL extracted text treated as empty, never a stage failure
    r = rows[("c2", 0)]
    assert r["formatted_text"] == ""
    assert r["ai_success"]


def test_enrich_bad_callable_contained_per_chunk(spark):
    # even a completely broken callable is contained as per-chunk failure
    # (the reference's per-chunk try/except, reformatter.py:115-121) —
    # originals pass through, the stage never dies
    df = spark.createDataFrame([("c", 0, "keep me")],
                               "conv_id string, turn_idx int, "
                               "extracted_text string")
    r = enrich_reformat(df, None).collect()[0]
    assert r["formatted_text"] == "keep me"
    assert not r["ai_success"]
    assert "TypeError" in r["ai_error"]
