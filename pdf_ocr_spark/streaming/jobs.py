"""Structured Streaming jobs.

The reference has no streaming (progress is polled from in-memory dicts,
SmartPDF-OCR ``app/api/ocr.py:23-24`` — SURVEY §2.11), but a transcripts
table at 10^12-turn scale is append-only in practice, so the engine exposes
the same extraction as an incremental job: ``readStream`` over the input
directory -> the identical mapInPandas extraction -> ``writeStream``
(file sink + checkpoint). Late-data handling is demonstrated with a
watermarked windowed aggregate over turn timestamps.

Batch/stream parity: the UDF and schema are shared with the batch pipeline,
so a turn extracted incrementally is byte-identical to the batch result
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT, EngineConfig
from ..pipeline import OUTPUT_SCHEMA, _make_extract_udf, with_bucket

INPUT_SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp")


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT,
    available_now: bool = True,
):
    """Incremental extraction over a growing transcripts directory.

    Per micro-batch the work is identical to one batch-pipeline pass;
    exactly-once delivery comes from the file sink + checkpoint (the
    streaming analog of the lineage/resume design)."""
    src = (spark.readStream.schema(INPUT_SCHEMA)
           .option("maxFilesPerTrigger", "8")
           .parquet(input_dir)
           .select("conv_id", "turn_idx", "text"))
    src = with_bucket(src, cfg.num_buckets, cfg.salt_turns_per_group)
    result = src.mapInPandas(_make_extract_udf(cfg), schema=OUTPUT_SCHEMA)
    writer = (result.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def conversation_state_stats(
    spark: SparkSession,
    input_dir: str,
):
    """Custom stateful operator via applyInPandasWithState: per-conversation
    running counters (turns seen, payload-kind counts, chars) maintained in
    streaming state across micro-batches — the engine's analog of the
    reference's in-memory task_status dict (api/ocr.py:23-24,76-83), but
    durable and partitioned.

    Returns the streaming DataFrame (conv_id, n_turns, n_pdf, n_html,
    n_chars); caller attaches a sink.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("conv_id string, n_turns long, n_pdf long, n_html long, "
                  "n_chars long")
    state_schema = "n_turns long, n_pdf long, n_html long, n_chars long"

    def update(key, pdfs, state):
        import pandas as pd
        if state.exists:
            n_turns, n_pdf, n_html, n_chars = state.get
        else:
            n_turns = n_pdf = n_html = n_chars = 0
        for batch in pdfs:
            texts = batch["text"].fillna("")  # NULL-safe prefix counters
            n_turns += len(batch)
            # lstrip like the engine's routing (detector.detect_payload_kind
            # / extract.route_kinds): a '\nJVBERi...' turn extracts as pdf
            # and must count as pdf here too (ADVICE r4)
            stripped = texts.str.lstrip()
            n_pdf += int(stripped.str.startswith("JVBERi").sum())
            heads = stripped.str.slice(0, 15).str.lower()
            n_html += int((heads.str.startswith("<!doctype html")
                           | heads.str.startswith("<html")).sum())
            n_chars += int(texts.str.len().sum())
        state.update((n_turns, n_pdf, n_html, n_chars))
        yield pd.DataFrame([{
            "conv_id": key[0], "n_turns": n_turns, "n_pdf": n_pdf,
            "n_html": n_html, "n_chars": n_chars,
        }])

    src = (spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
           .select("conv_id", "text"))
    return (src.groupBy("conv_id")
            .applyInPandasWithState(
                update, out_schema, state_schema, "update",
                GroupStateTimeout.NoTimeout))


def stream_method_counts(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked windowed per-method turn counts (late-data demo).

    Returns the streaming DataFrame; caller attaches a sink. Payload-kind
    routing reuses the cheap prefix tests (no decode in the aggregation
    path)."""
    src = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    # strip ALL leading whitespace like the engine's lstrip() does
    # (extract.py html routing): F.ltrim strips spaces only, so a
    # '\n<html>' turn would route html in extraction but count as
    # 'plain' here and the monitoring would diverge (review)
    stripped_raw = F.regexp_replace(F.col("text"), r"^\s+", "")
    stripped = F.lower(stripped_raw)
    kind = (
        F.when(F.col("text").isNull(), "null")
        # case-sensitive base64 prefix on the STRIPPED text — same lstrip
        # the engine's routing applies, so pdf counts match extraction
        # for whitespace-prefixed payloads too (ADVICE r4)
        .when(stripped_raw.startswith("JVBERi"), "pdf")
        .when(stripped.startswith("<!doctype html")
              | stripped.startswith("<html"), "html")
        .otherwise("plain"))
    return (src.withColumn("kind", kind)
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "kind")
            .agg(F.count("*").alias("n_turns"))
            .select(F.col("window.start").alias("window_start"),
                    "kind", "n_turns"))


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen turn per distinct
    payload within the watermark horizon.

    The streaming analog of the batch exact-dedup pre-pass (and of the
    reference's content-hash dedup intent, SmartPDF-OCR
    app/core/file_manager.py:137-143): rows are keyed by md5(text) and
    ``dropDuplicatesWithinWatermark`` holds one state entry per distinct
    key, EVICTING entries once they age past the watermark — so state
    size is bounded by (arrival rate x horizon), not corpus size, which
    is what makes exact dedup runnable on an unbounded 10^12-turn
    stream. Duplicates arriving farther apart than the horizon are not
    collapsed (the documented trade; widen the watermark or run the
    batch op over the sink for full-history dedup).

    NULL-text turns carry no content to deduplicate (same rule as the
    batch analog, dedup_extracted.turns_as_docs): they bypass the dedup
    state and pass through with th = NULL — a coalesce-to-'' key would
    collapse NULL turns with genuinely-empty-text turns AND silently
    drop every NULL turn after the first.

    Returns the streaming DataFrame; caller attaches a sink."""
    src = (spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
           .withWatermark("ts", watermark))
    deduped = (src.filter(F.col("text").isNotNull())
               .withColumn("th", F.md5("text"))
               .dropDuplicatesWithinWatermark(["th"]))
    passthrough = (src.filter(F.col("text").isNull())
                   .withColumn("th", F.lit(None).cast("string")))
    return deduped.unionByName(passthrough)
