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
    """One viral attachment referenced by 50k turns (VERDICT r1 #3: the
    ph-join skew candidate) + a cold tail of distinct payloads. The hot
    key must stay heavy AFTER shuffle compression (identical ph + near-
    sequential conv ids compress brutally), hence the high ref count."""
    import pyarrow as pa
    from pdf_ocr_spark.fixtures import _pdf_payload, _plain_payload
    rng = random.Random(99)
    hot = _pdf_payload(rng, "text")
    cold = [_pdf_payload(rng, "text") for _ in range(20)]
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    for c in range(100):
        for t in range(512):
            rows["conv_id"].append(f"conv-{c:06d}")
            rows["turn_idx"].append(t)
            if t < 500:
                rows["text"].append(hot)      # 100*500 = 50000 hot refs
            elif t == 500:
                rows["text"].append(cold[c % 20])
            else:
                rows["text"].append(_plain_payload(rng))
    path = str(tmp_path_factory.mktemp("viral") / "t.parquet")
    table = pa.table({"conv_id": pa.array(rows["conv_id"], pa.string()),
                      "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                      "text": pa.array(rows["text"], pa.string())})
    import pyarrow.parquet as pqw
    pqw.write_table(table, path)
    return {"path": path, "hot": hot, "n_hot": 50000}


_SKEW_CONFS = {
    # shrink AQE's skew thresholds so the 50k-ref key triggers the same
    # OptimizeSkewedJoin machinery a multi-GB viral key triggers in
    # production, and force the sort-merge path (the broadcast path is
    # separately asserted below). Thresholds compare COMPRESSED map-output
    # sizes, and 50k near-identical slim rows lz4-compress to single-digit
    # KB — hence the aggressive values.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


class _conf_override:
    def __init__(self, spark, confs):
        self.spark, self.confs, self.saved = spark, confs, {}

    def __enter__(self):
        for k, v in self.confs.items():
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.spark.conf.set(k, v)

    def __exit__(self, *a):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_viral_attachment_aqe_splits_skewed_join(spark, viral_fixture):
    """At scale the payload join-back is a sort-merge join and the viral
    key hashes all its turns to one reducer; AQE's OptimizeSkewedJoin must
    split it. Asserted on the REAL build_result plan with the skew
    thresholds scaled down to fixture size — the executed final plan must
    carry SortMergeJoin(skew=true)."""
    from pdf_ocr_spark.config import DEFAULT
    from pdf_ocr_spark.pipeline import build_result, with_bucket
    with _conf_override(spark, _SKEW_CONFS):
        df = spark.read.parquet(viral_fixture["path"])
        result = build_result(with_bucket(df, 16, 64), DEFAULT, 8)
        rows = result.collect()
        plan = result._jdf.queryExecution().executedPlan().toString()
    assert len(rows) == pq.read_table(viral_fixture["path"]).num_rows
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, \
        "AQE did not split the viral-key join partition"
    assert "skewed" in plan  # AQEShuffleRead ... skewed


def test_viral_broadcast_plan(spark, viral_fixture):
    """With default thresholds the decoded distinct payloads are small
    enough that AQE broadcasts them — asserted on the executed final
    plan: the join-back is a BroadcastHashJoin, so the turns side never
    shuffles by ph and the viral key cannot skew anything."""
    from pdf_ocr_spark.config import DEFAULT
    from pdf_ocr_spark.pipeline import build_result, with_bucket
    df = spark.read.parquet(viral_fixture["path"])
    result = build_result(with_bucket(df, 16, 64), DEFAULT, 8)
    result.collect()
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("== Initial Plan ==")[0]


def test_viral_attachment_broadcast_path_and_equality(spark, viral_fixture,
                                                      tmp_path_factory):
    """Correctness on the broadcast path: every hot turn extracted
    byte-identically."""
    from pyspark.sql import functions as F
    from pdf_ocr_spark.pipeline import run_extraction

    base = tmp_path_factory.mktemp("viralrun")
    metrics = run_extraction(
        spark, viral_fixture["path"], str(base / "out"), str(base / "lin"),
        run_id="viral", num_buckets=16, num_partitions=8, resume=False)
    n_in = pq.read_table(viral_fixture["path"]).num_rows
    assert metrics["rows_out"] == n_in

    out = spark.read.parquet(str(base / "out"))
    expect = oracle.extract_turn(viral_fixture["hot"])
    hot_rows = out.filter(F.col("method") == "extract") \
        .filter(F.col("extracted_text") == expect.extracted_text)
    assert hot_rows.count() == viral_fixture["n_hot"]


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
