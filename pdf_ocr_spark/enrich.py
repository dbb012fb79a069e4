"""Optional AI-enrichment stage (reformatter skeleton).

The reference's AI reformatter (SmartPDF-OCR ``app/ai/reformatter.py:30-250``)
rewrites OCR text through an external LLM. The LLM call itself is
non-deterministic and process-external, so it is EXCLUDED from the engine's
byte-equality core (SURVEY §2.12) — but everything around it is
deterministic arithmetic, ported here and tested:

- ``split_into_chunks``: the exact chunking algorithm
  (reformatter.py:55-81) — paragraphs accumulate into ``max_chunk_chars``
  budgets counting a +2 separator, oversized paragraphs hard-split at
  ``max_chunk_chars`` boundaries, residue flushed, whole text as fallback.
- ``merge_chunk_results``: per-chunk fallback semantics
  (reformatter.py:205-217): a failed chunk contributes its ORIGINAL text,
  chunks joined with "\\n\\n", success only when no chunk errored.
- ``enrich_reformat``: the Spark stage — ``mapInPandas`` over extracted
  turns, chunk -> per-chunk callable -> merge. The callable is the
  external-LLM boundary (reference ``_call_ai_api``,
  reformatter.py:165-172); the default raises unless one is supplied, the
  Spark plumbing (schema, batching, containment) is real and tested with a
  deterministic fake.

Scale shape: the enrichment stage is embarrassingly parallel per turn (the
reference fans chunks out with asyncio.gather, reformatter.py:195-198; in
Spark the partition is the unit of parallelism and an engine/HTTP client
would be cached per worker process like the OCR engine singleton).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, BooleanType, StructField, StructType,
)

DEFAULT_MAX_CHUNK_CHARS = 4000  # reference reformatter.py:38


@dataclass
class ChunkResult:
    """Mirror of the reference's ReformatResult (reformatter.py:18-24)."""
    original: str
    formatted: str
    success: bool
    error: str | None = None


def split_into_chunks(text: str,
                      max_chunk_chars: int = DEFAULT_MAX_CHUNK_CHARS) -> list:
    """Faithful port of ``_split_into_chunks`` (reformatter.py:55-81),
    including its quirks: the running chunk carries a trailing "\\n\\n"
    that counts against the budget, an oversized paragraph is hard-split
    WITHOUT flushing order issues (current chunk flushes first), and the
    final fallback returns the whole text as one chunk."""
    if len(text) <= max_chunk_chars:
        return [text]

    chunks: list[str] = []
    paragraphs = text.split("\n\n")
    current_chunk = ""

    for para in paragraphs:
        if len(current_chunk) + len(para) + 2 <= max_chunk_chars:
            current_chunk += para + "\n\n"
        else:
            if current_chunk:
                chunks.append(current_chunk.strip())
            if len(para) > max_chunk_chars:
                for i in range(0, len(para), max_chunk_chars):
                    chunks.append(para[i:i + max_chunk_chars])
                current_chunk = ""
            else:
                current_chunk = para + "\n\n"

    if current_chunk.strip():
        chunks.append(current_chunk.strip())

    return chunks if chunks else [text]


def merge_chunk_results(results: list) -> dict:
    """Per-chunk fallback merge (reformatter.py:200-221): failed chunks
    fall back to their original text; overall success iff no errors."""
    formatted_chunks = []
    errors = []
    success_count = 0
    for r in results:
        if r.success:
            formatted_chunks.append(r.formatted)
            success_count += 1
        else:
            formatted_chunks.append(r.original)
            if r.error:
                errors.append(r.error)
    return {
        "success": len(errors) == 0,
        "formatted": "\n\n".join(formatted_chunks),
        "chunks_total": len(results),
        "chunks_processed": success_count,
        "error": "; ".join(errors) if errors else None,
    }


ENRICH_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("formatted_text", StringType()),
    StructField("ai_success", BooleanType()),
    StructField("chunks_total", LongType()),
    StructField("chunks_processed", LongType()),
    StructField("ai_error", StringType()),
])


def enrich_reformat(
    extracted: DataFrame,
    reformat_chunk: Callable[[str], ChunkResult],
    max_chunk_chars: int = DEFAULT_MAX_CHUNK_CHARS,
    passthrough: tuple = (),
) -> DataFrame:
    """The enrichment stage: extracted turns -> chunk -> per-chunk callable
    -> merged formatted text, as an Arrow-batched ``mapInPandas`` stage.

    ``reformat_chunk`` is the external-LLM boundary; exceptions it raises
    are contained per chunk as failed ChunkResults (the reference's
    per-chunk try/except, reformatter.py:115-121), so one bad chunk can
    never fail the stage.

    ``passthrough`` names extra input columns copied to the output
    unchanged (e.g. ("bucket",) so the pipeline can write the enriched
    table bucket-partitioned without a join back)."""
    schema = StructType(ENRICH_SCHEMA.fields + [
        extracted.schema[c] for c in passthrough])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("conv_id", "turn_idx", "formatted_text",
                                   "ai_success", "chunks_total",
                                   "chunks_processed", "ai_error")}
            for conv_id, turn_idx, text in zip(
                    batch["conv_id"].values, batch["turn_idx"].values,
                    batch["extracted_text"].values):
                chunks = split_into_chunks(text or "", max_chunk_chars)
                results = []
                for c in chunks:
                    try:
                        results.append(reformat_chunk(c))
                    except Exception as e:
                        results.append(ChunkResult(
                            original=c, formatted=c, success=False,
                            error=f"{type(e).__name__}: {e}"))
                merged = merge_chunk_results(results)
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(turn_idx)
                out["formatted_text"].append(merged["formatted"])
                out["ai_success"].append(merged["success"])
                out["chunks_total"].append(merged["chunks_total"])
                out["chunks_processed"].append(merged["chunks_processed"])
                out["ai_error"].append(merged["error"])
            res = pd.DataFrame(out)
            for c in passthrough:
                res[c] = batch[c].values
            yield res

    cols = ["conv_id", "turn_idx", "extracted_text", *passthrough]
    return extracted.select(*cols).mapInPandas(run, schema=schema)
