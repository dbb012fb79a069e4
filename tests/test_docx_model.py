"""S10/S11 model-layer parity with the reference exporters' feed logic.

Every quirk is pinned so a future 'cleanup' can't silently diverge from
docx_export.py:114-213 / searchable_pdf.py:72-105.
"""

import json

from pdf_ocr_spark.docx_model import (
    confidence_runs, overlay_spec, parse_markdown_blocks, split_bold_runs,
    with_docx_blocks,
)


def test_heading_levels_and_clamp():
    blocks = parse_markdown_blocks(["# One\n### Three\n" + "#" * 12 + " Deep"])
    assert blocks[0] == {"type": "heading", "level": 1, "text": "One"}
    assert blocks[1] == {"type": "heading", "level": 3, "text": "Three"}
    # level counts all leading '#', clamped at 9 (docx_export.py:129-137)
    assert blocks[2]["level"] == 9 and blocks[2]["text"] == "Deep"


def test_blank_lines_skipped_and_paragraph_passthrough():
    blocks = parse_markdown_blocks(["alpha\n\n\nbeta"])
    assert [b["type"] for b in blocks] == ["paragraph", "paragraph"]
    assert blocks[0]["runs"] == [("alpha", False)]


def test_paragraphs_joined_with_single_newline_before_parsing():
    # page paragraphs merge with "\n" (docx_export.py:119), so a heading
    # at the start of the SECOND paragraph is still recognized
    blocks = parse_markdown_blocks(["text", "# head"])
    assert [b["type"] for b in blocks] == ["paragraph", "heading"]


def test_list_strip_asymmetry_quirk():
    # unordered content is stripped; ordered content is match.group(2)
    # UNstripped (docx_export.py:142-149)
    blocks = parse_markdown_blocks(["-   spaced bullet\n1.  spaced number"])
    assert blocks[0]["type"] == "list_bullet"
    assert blocks[0]["runs"] == [("spaced bullet", False)]
    assert blocks[1]["type"] == "list_number"
    assert blocks[1]["runs"] == [(" spaced number", False)]  # kept space


def test_bold_run_splitting():
    runs = split_bold_runs("a **b** c")
    assert runs == [("a ", False), ("b", True), (" c", False)]
    # len > 4 guard: "****" is NOT a bold run (docx_export.py:159); the
    # re.split capture still brackets it with empty runs (reference
    # add_run('') behavior)
    assert split_bold_runs("****") == [("", False), ("****", False),
                                       ("", False)]
    assert split_bold_runs("**x**")[0] == ("", False)


def test_confidence_runs_threshold():
    runs = confidence_runs([("good", 0.9), ("bad", 0.4), ("edge", 0.5)])
    assert runs == [("good", False), ("bad", True), ("edge", False)]


def test_overlay_spec_coordinates_and_font_floor():
    # dpi 300 -> scale 0.24; height 50px -> 50*0.24*0.8 = 9.6pt
    spec = overlay_spec([("hello", 100.0, 200.0, 50.0)], dpi=300)
    s = spec[0]
    assert s["x"] == 100.0 * 0.24
    assert abs(s["font_size"] - 9.6) < 1e-9
    assert s["y_baseline"] == 200.0 * 0.24 + s["font_size"]
    assert s["render_mode"] == 3
    # the reference's quirky floor: < 1 jumps to 8, [1, 8) passes through
    tiny = overlay_spec([("t", 0, 0, 5.0)], dpi=300)[0]      # 0.96 -> 8
    assert tiny["font_size"] == 8
    small = overlay_spec([("s", 0, 0, 10.0)], dpi=300)[0]    # 1.92 stays
    assert abs(small["font_size"] - 1.92) < 1e-9


def test_with_docx_blocks_spark(spark):
    df = spark.createDataFrame(
        [("c1", 0, "# Title\n\n- item\n\nplain **bold**"), ("c1", 1, None)],
        "conv_id string, turn_idx int, extracted_text string")
    rows = {(r["conv_id"], r["turn_idx"]): json.loads(r["blocks_json"])
            for r in with_docx_blocks(df).collect()}
    blocks = rows[("c1", 0)]
    assert [b["type"] for b in blocks] == \
        ["heading", "list_bullet", "paragraph"]
    assert blocks[2]["runs"] == [["plain ", False], ["bold", True],
                                 ["", False]]
    assert rows[("c1", 1)] == []  # NULL text -> empty model, no failure
