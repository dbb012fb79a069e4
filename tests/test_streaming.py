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


def test_stream_dedup_exact_collapses_cross_batch_duplicates(
        spark, tmp_path_factory):
    """Streaming exact dedup (watermark-bounded state): duplicates
    arriving in DIFFERENT micro-batch files within the horizon collapse
    to one surviving row per distinct payload; parity with the batch
    distinct-md5 count over the same input."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta
    from pdf_ocr_spark.streaming import stream_dedup_exact

    base = tmp_path_factory.mktemp("sdedup")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def write(name, rows):
        pq.write_table(pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([t0 + timedelta(minutes=r[3]) for r in rows],
                           pa.timestamp("us")),
        }), os.path.join(input_dir, name))

    # same payloads recur across both files, minutes apart (inside the
    # 1h horizon); 4 distinct texts total
    write("part-0.parquet", [
        ("c1", 0, "alpha body text", 0), ("c1", 1, "beta body text", 1),
        ("c2", 0, "alpha body text", 2),
    ])
    write("part-1.parquet", [
        ("c3", 0, "beta body text", 10), ("c3", 1, "gamma body text", 11),
        ("c4", 0, "delta body text", 12), ("c4", 1, "alpha body text", 13),
    ])

    dd = stream_dedup_exact(spark, input_dir, watermark="1 hour")
    q = (dd.writeStream.format("memory").queryName("sdedup")
         .outputMode("append")
         .option("checkpointLocation", str(base / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from sdedup").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha body text", "beta body text",
                     "delta body text", "gamma body text"]
    # parity: batch distinct-md5 count over the same directory
    batch = spark.read.parquet(input_dir)
    assert len(rows) == batch.selectExpr("md5(text) th") \
        .distinct().count()


def test_stream_dedup_exact_null_vs_empty(spark, tmp_path_factory):
    """NULL-text turns bypass dedup state (no content to deduplicate —
    batch-analog rule) and are NOT collapsed with each other or with
    genuinely-empty-text turns; empty texts dedup normally."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta
    from pdf_ocr_spark.streaming import stream_dedup_exact

    base = tmp_path_factory.mktemp("sdedupn")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [("c1", 0, None, 0), ("c2", 0, "", 1),
            ("c3", 0, None, 2), ("c4", 0, "", 3),
            ("c5", 0, "real text", 4), ("c6", 0, "real text", 5)]
    pq.write_table(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array(["user"] * len(rows), pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "tool": pa.array([None] * len(rows), pa.string()),
        "ts": pa.array([t0 + timedelta(minutes=r[3]) for r in rows],
                       pa.timestamp("us")),
    }), os.path.join(input_dir, "part-0.parquet"))

    dd = stream_dedup_exact(spark, input_dir, watermark="1 hour")
    q = (dd.writeStream.format("memory").queryName("sdedupn")
         .outputMode("append")
         .option("checkpointLocation", str(base / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from sdedupn").collect()
    # both NULL turns survive; '' collapses to one; 'real text' to one
    assert sorted(r["conv_id"] for r in out if r["text"] is None) \
        == ["c1", "c3"]
    assert len([r for r in out if r["text"] == ""]) == 1
    assert len([r for r in out if r["text"] == "real text"]) == 1
