"""Pipeline-tier run: skew handling, payload-dedup path, sampled equality."""

import random

import pyarrow.parquet as pq
import pytest

from pdf_ocr_spark import oracle
from pdf_ocr_spark.pipeline import run_extraction, with_bucket


@pytest.fixture(scope="module")
def pipeline_fixture(tmp_path_factory):
    from pdf_ocr_spark.fixtures import generate_transcripts
    path = str(tmp_path_factory.mktemp("ptier") / "transcripts.parquet")
    n = generate_transcripts(path, tier="pipeline")
    assert n > 1000
    return path


def test_skew_conversation_splits_across_buckets(spark, pipeline_fixture):
    df = spark.read.parquet(pipeline_fixture) \
        .select("conv_id", "turn_idx", "text")
    bucketed = with_bucket(df, 64, 64)
    # the 500-turn conversation (conv-000007, fixtures.py pipeline tier)
    buckets = {r["bucket"] for r in
               bucketed.filter("conv_id = 'conv-000007'")
               .select("bucket").distinct().collect()}
    assert len(buckets) >= 4  # salted across turn_idx//64 groups
    # ...while any 64 consecutive turns stay co-located
    one_group = bucketed.filter(
        "conv_id = 'conv-000007' and turn_idx < 64") \
        .select("bucket").distinct().count()
    assert one_group == 1


@pytest.fixture(scope="module")
def viral_fixture(tmp_path_factory):
    """One viral attachment referenced by 3000 turns (VERDICT r1 #3: the
    ph-join skew candidate) + a cold tail of distinct payloads."""
    import base64
    import pyarrow as pa
    from pdf_ocr_spark.fixtures import _pdf_payload, _plain_payload
    rng = random.Random(99)
    hot = _pdf_payload(rng, "text")
    cold = [_pdf_payload(rng, "text") for _ in range(20)]
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    for c in range(60):
        for t in range(55):
            rows["conv_id"].append(f"conv-{c:06d}")
            rows["turn_idx"].append(t)
            if t < 50:
                rows["text"].append(hot)      # 60*50 = 3000 hot refs
            elif t == 50:
                rows["text"].append(cold[c % 20])
            else:
                rows["text"].append(_plain_payload(rng))
    path = str(tmp_path_factory.mktemp("viral") / "t.parquet")
    table = pa.table({"conv_id": pa.array(rows["conv_id"], pa.string()),
                      "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                      "text": pa.array(rows["text"], pa.string())})
    import pyarrow.parquet as pqw
    pqw.write_table(table, path)
    return {"path": path, "hot": hot, "n_hot": 3000}


def _skew_cfg():
    import dataclasses
    from pdf_ocr_spark.config import DEFAULT
    return dataclasses.replace(
        DEFAULT, hot_payload_min_refs=500, hot_payload_salts=8)


def test_viral_attachment_salted_join_plan(spark, viral_fixture):
    """The hot-key path must be IN the plan: broadcast semi/anti routing of
    turns, explode-replication of hot results, and a cache so decode runs
    once across the four consumers."""
    from pdf_ocr_spark.pipeline import build_result, with_bucket
    df = spark.read.parquet(viral_fixture["path"])
    persisted = []
    result = build_result(with_bucket(df, 16, 64), _skew_cfg(), 8,
                          persisted)
    plan = result._jdf.queryExecution().executedPlan().toString()
    try:
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        assert "explode" in plan          # salt replication of hot results
        assert "InMemoryTableScan" in plan  # decode-once cache
    finally:
        for f in persisted:
            f.unpersist()


def test_viral_attachment_spread_and_equality(spark, viral_fixture,
                                              tmp_path_factory):
    from pyspark.sql import functions as F
    from pdf_ocr_spark.pipeline import run_extraction

    base = tmp_path_factory.mktemp("viralrun")
    metrics = run_extraction(
        spark, viral_fixture["path"], str(base / "out"), str(base / "lin"),
        run_id="viral", num_buckets=16, num_partitions=8, resume=False,
        cfg=_skew_cfg())
    n_in = pq.read_table(viral_fixture["path"]).num_rows
    assert metrics["rows_out"] == n_in

    out = spark.read.parquet(str(base / "out"))
    # every hot turn extracted, byte-identical to the oracle
    expect = oracle.extract_turn(viral_fixture["hot"])
    hot_rows = out.filter(F.col("method") == "extract") \
        .filter(F.col("extracted_text") == expect.extracted_text)
    assert hot_rows.count() == viral_fixture["n_hot"]

    # salting math: the hot key's turns spread across all 8 salt slots with
    # bounded imbalance (max <= 2x the ideal share)
    S = 8
    spread = (out.filter(F.col("extracted_text") == expect.extracted_text)
              .filter(F.col("method") == "extract")
              .groupBy(F.pmod(F.xxhash64("conv_id", "turn_idx"),
                              F.lit(S)).alias("salt"))
              .count().collect())
    counts = {r["salt"]: r["count"] for r in spread}
    assert len(counts) == S
    ideal = viral_fixture["n_hot"] / S
    assert max(counts.values()) <= 2 * ideal


def test_no_hot_keys_is_a_noop_path(spark, unit_transcripts,
                                    tmp_path_factory):
    """With default thresholds (no payload reaches min_refs) the salted
    branch is empty and results are unchanged — guarded by the equality
    suite, asserted cheaply here on row count."""
    from pdf_ocr_spark.pipeline import run_extraction
    base = tmp_path_factory.mktemp("nohot")
    m = run_extraction(spark, unit_transcripts, str(base / "out"),
                       str(base / "lin"), run_id="nh", num_buckets=8,
                       num_partitions=8, resume=False)
    assert m["rows_out"] == pq.read_table(unit_transcripts).num_rows


def test_pipeline_tier_run_and_sampled_equality(spark, pipeline_fixture,
                                                tmp_path_factory):
    base = tmp_path_factory.mktemp("prun")
    metrics = run_extraction(
        spark, pipeline_fixture, str(base / "out"), str(base / "lin"),
        run_id="ptier", num_buckets=64, num_partitions=16, resume=False)
    n_in = pq.read_table(pipeline_fixture).num_rows
    assert metrics["rows_out"] == n_in

    # spot-check equality on a deterministic sample incl. the skew conv
    rows = pq.read_table(pipeline_fixture).to_pylist()
    rng = random.Random(7)
    sample = rng.sample(rows, 40) + \
        [r for r in rows if r["conv_id"] == "conv-000007"][:10]
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           spark.read.parquet(str(base / "out")).collect()}
    for row in sample:
        key = (row["conv_id"], row["turn_idx"])
        expect = oracle.extract_turn(row["text"])
        assert got[key]["extracted_text"] == expect.extracted_text, key
        assert got[key]["method"] == expect.method, key
