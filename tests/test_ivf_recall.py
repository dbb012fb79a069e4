"""IVF ANN recall against brute-force cosine ground truth (sf0.001).

The refined-centroid, multi-probe IVF (2 Lloyd iterations, nprobe=2) must
beat single-probe on the same data and land >= 4 of the exact top-5.
Everything is deterministic (fixed testdata, seeded centroids, rounded
Lloyd means), so these are exact assertions, not statistical ones.
"""

import pytest

from pdf_ocr_spark.relational.similarity import (
    q_ann_cosine_topk, q_ann_ivf,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def brute_top5(spark):
    return [r["vec_id"] for r in
            q_ann_cosine_topk(spark, SF).collect()][:5]


def test_multiprobe_recall(spark, brute_top5):
    ivf = [r["vec_id"] for r in q_ann_ivf(spark, SF).collect()]
    assert len(set(brute_top5) & set(ivf)) >= 4


def test_refinement_and_multiprobe_beat_single_probe(spark, brute_top5):
    one = [r["vec_id"] for r in
           q_ann_ivf(spark, SF, nprobe=1).collect()]
    two = [r["vec_id"] for r in q_ann_ivf(spark, SF).collect()]
    assert len(set(brute_top5) & set(two)) >= len(set(brute_top5) & set(one))


def test_probe_widening_is_monotone(spark):
    """Candidates can only grow with nprobe; the ranked prefix agrees."""
    two = [r["vec_id"] for r in q_ann_ivf(spark, SF, nprobe=2, k=5).collect()]
    four = [r["vec_id"] for r in
            q_ann_ivf(spark, SF, nprobe=4, k=5).collect()]
    # every nprobe=2 hit that survives in the wider candidate set keeps
    # its relative order (both ranked by the same exact cosine)
    common = [v for v in four if v in two]
    assert common == [v for v in two if v in common]


def test_semdedup_drops_are_justified_and_minimal(spark):
    """Every dropped vector must have a LOWER-id same-cluster mate at
    cosine >= threshold (justified), and every kept vector must NOT
    (minimal) — the exact SemDeDup keep-min-exemplar semantics,
    recomputed driver-side with numpy."""
    import numpy as np
    from pdf_ocr_spark.relational.similarity import (
        EMB_NEARDUP_THRESHOLD, q_semdedup)
    got = q_semdedup(spark, SF, threshold=EMB_NEARDUP_THRESHOLD) \
        .toPandas().set_index("vec_id").sort_index()
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas()
           .set_index("vec_id").sort_index())
    assert len(got) == len(emb)
    assert (~got.keep).any() and got.keep.any()  # non-vacuous both ways
    m = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    norms = np.linalg.norm(m, axis=1)
    cos = (m @ m.T) / np.outer(norms, norms)
    ids = emb.index.to_numpy()
    cent = got.cent_id.to_numpy()
    for i, vid in enumerate(ids):
        mates = np.where((cent == cent[i]) & (ids < vid))[0]
        has_near = bool(len(mates)) and \
            (cos[i, mates] >= EMB_NEARDUP_THRESHOLD).any()
        assert bool(got.keep.loc[vid]) == (not has_near), vid


def test_semdedup_pairs_stay_within_clusters(spark):
    """The quadratic search must be a cent_id equi-join: no
    CartesianProduct and no vector-vector BroadcastNestedLoopJoin other
    than the tiny centroid-assignment broadcasts."""
    from pdf_ocr_spark.relational.similarity import q_semdedup
    df = q_semdedup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or \
        "BroadcastHashJoin" in plan  # the cent_id pair equi-join


def test_embedding_neardup_banded_recall(spark, tmp_path):
    """The banded LSH must catch nearly all true cosine>=0.95 pairs
    (theory: ~0.986 for 4 bands x 4 planes) — the single 8-plane bucket
    it replaced caught only ~0.43. Planted pairs, deterministic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.relational.similarity import (
        q_dedup_embedding_cosine)

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(60, 64)) * 0.035
    dup = base + noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    vecs = np.concatenate([base, dup]).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(120), pa.int64()),
        "label": pa.array(["x"] * 120, pa.string()),
        "embedding": pa.array([list(v) for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    # driver-side brute-force truth at the production threshold
    vd = vecs.astype(np.float64)
    sims = vd @ vd.T / np.outer(np.linalg.norm(vd, axis=1),
                                np.linalg.norm(vd, axis=1))
    truth = {(a, b) for a in range(120) for b in range(a + 1, 120)
             if sims[a, b] >= 0.95}
    assert len(truth) >= 50  # the planted pairs are real near-dups

    got = q_dedup_embedding_cosine(spark, str(tmp_path),
                                   threshold=0.95).toPandas()
    found = {(int(r.vec_a), int(r.vec_b)) for _, r in got.iterrows()}
    assert found <= truth  # exact verify: no false positives
    recall = len(found) / len(truth)
    assert recall >= 0.9, f"banded LSH recall {recall:.3f} < 0.9"


def test_quantized_ann_recall_and_error(spark):
    """int8 scalar-quantized cosine: the approx top-10 recovers >= 8 of
    the exact top-10 and per-pair quantization error stays in the SQ8
    regime (< 0.01 cosine) — the 4x-compression trade quantified."""
    from pdf_ocr_spark.relational.similarity import (
        q_ann_cosine_topk, q_ann_quantized)

    sf = SF
    approx = q_ann_quantized(spark, sf).toPandas()
    exact = set(q_ann_cosine_topk(spark, sf).toPandas()["vec_id"])
    assert len(set(approx["vec_id"]) & exact) >= 8
    assert float(approx["quant_err"].max()) < 0.01


def test_pq_adc_shortlist_rerank_recall(spark):
    """PQ/ADC with exact re-rank: the ADC shortlist must recover >= 9
    of the brute-force L2 top-10 after re-ranking, and the approx
    distances visibly differ from exact (the quantization is real, not
    a pass-through)."""
    import duckdb

    from pdf_ocr_spark.relational.similarity import q_ann_pq

    sf = SF
    got = q_ann_pq(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM '{sf}/embeddings.parquet'")
    exact = {r[0] for r in con.execute("""
      SELECT vec_id FROM embeddings e,
        (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qq
      WHERE vec_id <> 0
      ORDER BY list_sum(list_transform(range(1, 65),
        i -> (e.embedding[i]::DOUBLE - qq.q[i]::DOUBLE)
           * (e.embedding[i]::DOUBLE - qq.q[i]::DOUBLE))), vec_id
      LIMIT 10""").fetchall()}
    assert len(set(got["vec_id"]) & exact) >= 9
    assert (got["approx_l2sq"] != got["exact_l2sq"]).any()


def test_ivf_pq_composition_recall(spark):
    """The composed IVF-PQ (probe 2/16 cells -> ADC -> exact re-rank)
    recovers >= 6 of the global brute-force L2 top-10 — misses are
    exactly the neighbors living in unprobed cells (the nprobe trade),
    and every returned row must come from a probed cell by
    construction (10 rows, exact re-ranked)."""
    import duckdb

    from pdf_ocr_spark.relational.similarity import q_ann_ivf_pq

    got = q_ann_ivf_pq(spark, SF).toPandas()
    assert len(got) == 10
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM '{SF}/embeddings.parquet'")
    exact = {r[0] for r in con.execute("""
      SELECT vec_id FROM embeddings e,
        (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qq
      WHERE vec_id <> 0
      ORDER BY list_sum(list_transform(range(1, 65),
        i -> (e.embedding[i]::DOUBLE - qq.q[i]::DOUBLE)
           * (e.embedding[i]::DOUBLE - qq.q[i]::DOUBLE))), vec_id
      LIMIT 10""").fetchall()}
    assert len(set(got["vec_id"]) & exact) >= 6
