"""Export formats over extraction output (reference S7-S9).

The reference exports per-task files (txt/md/docx/searchable-pdf); here the
same text-assembly semantics are column functions over the output table —
an export is a ``select``, not a file loop. DOCX and searchable-PDF are out
of scope (binary document authoring, SURVEY §2.1 S10/S11); their surviving
pieces are the low-confidence flag and the coordinate transform (relational
queries ``low_confidence`` / ``coord_scale``).

Byte-pinned semantics (tests/test_export.py):
  * TXT (S7, txt_export.py:61-77): page separator template
    "\\n\\n--- 第 {page} 页 ---\\n\\n" with page = page_num + 1, emitted
    only BETWEEN pages (never before the first); paragraphs joined "\\n\\n".
  * TXT simple (S8, txt_export.py:79-108): all paragraphs of all pages
    joined "\\n\\n" with no page markers — the canonical extracted_text.
  * Markdown (S9, api/export.py:101-114): optional "# {title}\\n\\n", then
    per page "\\n## 第 {n} 页\\n\\n" + "{para}\\n\\n" per paragraph.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PAGE_SEPARATOR = "\n\n--- 第 {page} 页 ---\n\n"


def txt_pages(pages: list, include_page_numbers: bool = True,
              page_separator: str = PAGE_SEPARATOR,
              paragraph_separator: str = "\n\n") -> str:
    """Reference TxtExporter._generate_content (txt_export.py:61-77); the
    separator templates are constructor parameters in the reference
    (txt_export.py:15-20) and parameters here.

    ``pages``: [(page_num, [paragraph_text, ...])]. Driver-side/python
    variant used by the oracle-style tests."""
    parts = []
    for i, (page_num, paragraphs) in enumerate(pages):
        if i > 0 and include_page_numbers:
            parts.append(page_separator.format(page=page_num + 1))
        parts.append(paragraph_separator.join(paragraphs))
    return "".join(parts)


def txt_simple(pages: list, paragraph_separator: str = "\n\n") -> str:
    """Reference export_simple (txt_export.py:79-108)."""
    return paragraph_separator.join(
        p for _, paragraphs in pages for p in paragraphs)


def markdown(pages: list, title: str | None = None,
             include_page_numbers: bool = True) -> str:
    """Reference markdown export (api/export.py:101-114).

    Quirk, faithfully mirrored: the reference's markdown path renders
    the RAW page_num (api/export.py:111) while its txt path renders
    page_num + 1 (txt_export.py:68) — the same document shows
    '--- 第 1 页 ---' in txt and '## 第 0 页' in markdown. Pinned by
    test_export.py; do not 'fix' one side alone."""
    out = []
    if title:
        out.append(f"# {title}\n\n")
    for page_num, paragraphs in pages:
        if include_page_numbers:
            out.append(f"\n## 第 {page_num} 页\n\n")
        for p in paragraphs:
            out.append(f"{p}\n\n")
    return "".join(out)


# --- column-level exports over the output table ---------------------------

def spans_to_paragraphs(extracted_text: Column, spans: Column) -> Column:
    """Recover the paragraph array from extracted_text + spans — the
    output table's spans ARE the paragraph index (L7 semantics)."""
    return F.transform(
        spans,
        lambda s: F.substring(
            extracted_text, s["start"] + 1, s["end"] - s["start"]))


def with_markdown_export(df: DataFrame, title_col: str = "conv_id") \
        -> DataFrame:
    """Add a markdown_export column (S9) rendered from spans, treating the
    turn as a single page (page markers per PDF page would need the
    per-page span ranges, which the single-page methods don't have)."""
    paras = spans_to_paragraphs(F.col("extracted_text"), F.col("spans"))
    body = F.aggregate(
        paras, F.lit(""), lambda acc, p: F.concat(acc, p, F.lit("\n\n")))
    return df.withColumn(
        "markdown_export",
        F.concat(F.lit("# "), F.col(title_col), F.lit("\n\n"), body))


def with_low_confidence_flag(df: DataFrame,
                             threshold: float | None = None) -> DataFrame:
    """S10's confidence highlighting -> boolean column. Default comes
    from EngineConfig.ocr_confidence_threshold (reference config.py:66)
    instead of a drifting literal (code-review r3)."""
    if threshold is None:
        from .config import DEFAULT
        threshold = DEFAULT.ocr_confidence_threshold
    return df.withColumn("low_confidence", F.col("confidence") < threshold)


def assemble_conversations(result: DataFrame,
                           sep: str = "\n\n") -> DataFrame:
    """Training-data export: one row per conversation with all extracted
    turn texts joined in turn order (the conversation-level analog of the
    page assembly L7). JVM-only: sort_array over collected structs — no
    UDF, one shuffle on conv_id."""
    # column API, not an f-string SQL expression: ``sep`` is caller
    # data, and interpolating it into a SQL literal broke on quotes and
    # re-interpreted backslash escapes (review); array_join takes the
    # delimiter as a plain Python string
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.struct("turn_idx", "extracted_text"))),
            lambda x: x["extracted_text"]),
        sep)
    return (result
            .groupBy("conv_id")
            .agg(
                joined.alias("conversation_text"),
                F.count("*").alias("n_turns"),
                F.sum(F.when(F.col("method") == "error", 1).otherwise(0))
                .alias("n_errors")))
