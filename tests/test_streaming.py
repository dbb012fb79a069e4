"""Structured Streaming parity and watermarked aggregation."""

import os
import shutil

import pytest

from pdf_ocr_spark.streaming import (
    conversation_state_stats, stream_extraction, stream_method_counts,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, unit_transcripts, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    shutil.copy(unit_transcripts, input_dir + "/part-0.parquet")
    return {"base": str(base), "input": input_dir}


def test_stream_extraction_matches_batch(spark, unit_transcripts,
                                         stream_dirs):
    out = stream_dirs["base"] + "/out"
    ckpt = stream_dirs["base"] + "/ckpt"
    q = stream_extraction(spark, stream_dirs["input"], out, ckpt,
                          available_now=True)
    q.awaitTermination(300)

    got = {(r["conv_id"], r["turn_idx"]): r["extracted_text"]
           for r in spark.read.parquet(out).collect()}
    from pdf_ocr_spark import oracle
    import pyarrow.parquet as pq
    for row in pq.read_table(unit_transcripts).to_pylist():
        expect = oracle.extract_turn(row["text"])
        assert got[(row["conv_id"], row["turn_idx"])] \
            == expect.extracted_text

    # incremental restart with no new files: no duplicate output
    n_before = spark.read.parquet(out).count()
    q2 = stream_extraction(spark, stream_dirs["input"], out, ckpt,
                           available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_conversation_state_stats(spark, stream_dirs, unit_transcripts,
                                  tmp_path_factory):
    agg = conversation_state_stats(spark, stream_dirs["input"])
    base = str(tmp_path_factory.mktemp("state"))
    q = (agg.writeStream.format("memory").queryName("conv_state")
         .outputMode("update")
         .option("checkpointLocation", base + "/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["conv_id"]: r for r in
            spark.sql("select * from conv_state").collect()}
    import pyarrow.parquet as pq
    import collections
    expect = collections.Counter()
    pdf_counts = collections.Counter()
    for row in pq.read_table(unit_transcripts).to_pylist():
        expect[row["conv_id"]] += 1
        if (row["text"] or "").startswith("JVBERi"):
            pdf_counts[row["conv_id"]] += 1
    for conv, n in expect.items():
        assert rows[conv]["n_turns"] == n, conv
        assert rows[conv]["n_pdf"] == pdf_counts.get(conv, 0), conv


def test_stream_method_counts(spark, stream_dirs, tmp_path_factory):
    agg = stream_method_counts(spark, stream_dirs["input"],
                               watermark="1 minute", window="1 hour")
    base = str(tmp_path_factory.mktemp("agg"))
    q = (agg.writeStream.format("memory").queryName("method_counts")
         .outputMode("complete")
         .option("checkpointLocation", base + "/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from method_counts").collect()
    kinds = {r["kind"] for r in rows}
    assert {"pdf", "html", "plain"} <= kinds
    assert all(r["n_turns"] > 0 for r in rows)
