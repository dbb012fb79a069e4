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
