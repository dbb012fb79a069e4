"""Export format byte semantics (reference S7-S9)."""

from pdf_ocr_spark.export import (
    markdown, spans_to_paragraphs, txt_pages, txt_simple,
    with_low_confidence_flag, with_markdown_export,
)


PAGES = [
    (0, ["para one", "para two"]),
    (2, ["second page"]),  # page_num 2 -> shown as 页 3
]


def test_txt_separator_between_pages_only():
    # separator only when i > 0 (txt_export.py:67), page shown 1-based
    out = txt_pages(PAGES)
    assert out == ("para one\n\npara two"
                   "\n\n--- 第 3 页 ---\n\n"
                   "second page")


def test_txt_no_page_numbers():
    assert txt_pages(PAGES, include_page_numbers=False) == \
        "para one\n\npara twosecond page"


def test_txt_simple_joins_all_paragraphs():
    assert txt_simple(PAGES) == "para one\n\npara two\n\nsecond page"


def test_txt_empty_pages_list():
    # reference _generate_content over [] -> "" (txt_export.py:61-77)
    assert txt_pages([]) == ""
    assert txt_simple([]) == ""
    assert markdown([]) == ""
    assert markdown([], title="T") == "# T\n\n"


def test_txt_page_with_no_paragraphs_keeps_separator_arithmetic():
    # an empty page contributes "" but still advances the separator loop
    pages = [(0, ["a"]), (1, []), (2, ["b"])]
    assert txt_pages(pages) == ("a"
                                "\n\n--- 第 2 页 ---\n\n"
                                ""
                                "\n\n--- 第 3 页 ---\n\n"
                                "b")
    assert txt_simple(pages) == "a\n\nb"


def test_txt_custom_separators():
    # constructor params in the reference (txt_export.py:15-20)
    pages = [(0, ["a", "b"]), (1, ["c"])]
    out = txt_pages(pages, page_separator="<<{page}>>",
                    paragraph_separator="|")
    assert out == "a|b<<2>>c"
    assert txt_simple(pages, paragraph_separator="|") == "a|b|c"


def test_txt_single_page_never_gets_separator():
    assert txt_pages([(7, ["only"])]) == "only"
    # ...even when include_page_numbers is on and page_num is high
    assert "页" not in txt_pages([(99, ["x"])])


def test_markdown_layout():
    out = markdown(PAGES, title="Doc")
    assert out == ("# Doc\n\n"
                   "\n## 第 0 页\n\n"
                   "para one\n\npara two\n\n"
                   "\n## 第 2 页\n\nsecond page\n\n")


def test_markdown_no_title():
    assert markdown([(1, ["x"])]).startswith("\n## 第 1 页")


def test_column_exports(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("c1", "alpha\n\nbeta",
          [{"start": 0, "end": 5}, {"start": 7, "end": 11}], 0.4)],
        "conv_id string, extracted_text string, "
        "spans array<struct<start:int,end:int>>, confidence double")
    row = df.select(spans_to_paragraphs(
        F.col("extracted_text"), F.col("spans")).alias("paras")) \
        .collect()[0]
    assert row["paras"] == ["alpha", "beta"]

    md = with_markdown_export(df).collect()[0]["markdown_export"]
    assert md == "# c1\n\nalpha\n\nbeta\n\n"

    flagged = with_low_confidence_flag(df).collect()[0]
    assert flagged["low_confidence"] is True


def test_assemble_conversations_sep_is_data_not_sql(spark):
    """The separator is caller data: quotes and backslash sequences must
    pass through verbatim (the old f-string SQL interpolation raised on
    quotes and re-lexed backslash escapes)."""
    from pdf_ocr_spark.export import assemble_conversations
    df = spark.createDataFrame(
        [("c1", 1, "beta", "plain"), ("c1", 0, "alpha", "plain")],
        "conv_id string, turn_idx int, extracted_text string, "
        "method string")
    for sep in ["' ", "\\t", "\n\n", "'; DROP--"]:
        got = assemble_conversations(df, sep=sep).collect()
        assert got[0]["conversation_text"] == f"alpha{sep}beta"
        assert got[0]["n_turns"] == 2 and got[0]["n_errors"] == 0
