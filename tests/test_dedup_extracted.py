"""Dedup composed with the extraction pipeline's own output.

Two layers:
  * hand-computed equality on a small synthetic extracted frame
    (exact groups / near-dup pairs / cluster labels);
  * end-to-end: run the REAL pipeline over the unit fixture plus an
    injected byte-identical clone of one conversation's turns — the
    clone must surface in exact groups and share clusters with the
    original, and keep-one-per-cluster must keep exactly one canonical
    turn per duplicate pair.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_ocr_spark.dedup_extracted import (
    dedup_extracted_clusters, dedup_extracted_exact,
    dedup_extracted_neardup, turns_as_docs,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string")


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


@pytest.fixture(scope="module")
def extracted(spark):
    # c1#0 == c2#0 == c3#5 byte-identical; c1#1 near-dup of them
    # (one word changed); c9#0 unique; c9#1 errored (NULL)
    return _frame(spark, [
        ("c1", 0, BASE),
        ("c2", 0, BASE),
        ("c3", 5, BASE),
        ("c1", 1, BASE[:-5] + "lambda"),    # last word changed
        ("c9", 0, "totally different words nothing shared here at all ok"),
        ("c9", 1, None),
    ])


def test_turns_as_docs_drops_errors_and_is_keyed(spark, extracted):
    d = turns_as_docs(extracted).collect()
    assert len(d) == 5                      # NULL row dropped
    assert len({r["doc_id"] for r in d}) == 5
    assert all(isinstance(r["doc_id"], int) for r in d)


def test_exact_groups(spark, extracted):
    rows = dedup_extracted_exact(extracted).collect()
    assert len(rows) == 1
    g = rows[0]
    assert g["n_copies"] == 3 and g["n_convs"] == 3
    assert (g["first_conv"], g["first_turn"]) == ("c1", 0)


def test_neardup_pairs(spark, extracted):
    got = {tuple(sorted([(r["conv_a"], r["turn_a"]),
                         (r["conv_b"], r["turn_b"])]))
           : r["jaccard"]
           for r in dedup_extracted_neardup(extracted).collect()}
    trip = [("c1", 0), ("c2", 0), ("c3", 5)]
    # all three identical-pair combinations at jaccard exactly 1.0
    for p in [(trip[0], trip[1]), (trip[0], trip[2]),
              (trip[1], trip[2])]:
        assert got[tuple(sorted(p))] == 1.0
    # the mutated turn (last word changed): 10 words -> 8 shingles, the
    # single tail shingle rewritten -> inter 7, union 9, J = 7/9
    assert got[(("c1", 0), ("c1", 1))] == pytest.approx(7 / 9, abs=1e-6)
    assert len(got) == 6


def test_neardup_pairs_high_threshold_filters(spark, extracted):
    # threshold is applied AFTER exact-Jaccard verification, so 0.9
    # deterministically keeps only the identical-text pairs
    got = dedup_extracted_neardup(extracted, 0.9).collect()
    assert len(got) == 3
    assert all(r["jaccard"] == 1.0 for r in got)


def test_cluster_labels_keep_one(spark, extracted):
    rows = dedup_extracted_clusters(extracted, 0.5).collect()
    by_turn = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    assert len(rows) == 5
    quad = [("c1", 0), ("c1", 1), ("c2", 0), ("c3", 5)]
    cids = {by_turn[t]["cluster_id"] for t in quad}
    assert len(cids) == 1
    assert all(by_turn[t]["cluster_size"] == 4 for t in quad)
    assert sum(by_turn[t]["is_canonical"] for t in quad) == 1
    lone = by_turn[("c9", 0)]
    assert lone["cluster_size"] == 1 and lone["is_canonical"]


@pytest.fixture(scope="module")
def piped(spark, tmp_path_factory):
    """Real pipeline over the unit fixture + a byte-identical clone of
    conversation conv-000002's plain turns under a new conv_id."""
    from pdf_ocr_spark.fixtures import generate_transcripts
    from pdf_ocr_spark.pipeline import run_extraction

    td = tmp_path_factory.mktemp("dedup_e2e")
    inp = str(td / "t.parquet")
    generate_transcripts(inp, tier="unit")
    tbl = pq.read_table(inp)
    mask = [c == "conv-000002" for c in tbl["conv_id"].to_pylist()]
    clone = tbl.filter(pa.array(mask))
    clone = clone.set_column(
        0, "conv_id",
        pa.array(["conv-clone99"] * clone.num_rows, pa.string()))
    pq.write_table(pa.concat_tables([tbl, clone]), inp,
                   row_group_size=4096)
    run_extraction(spark, inp, str(td / "out"), str(td / "lin"),
                   run_id="d1", input_snapshot_id="s", num_buckets=8,
                   resume=False)
    return spark.read.parquet(str(td / "out"))


def test_e2e_exact_dedup_finds_cloned_conversation(spark, piped):
    rows = dedup_extracted_exact(piped).collect()
    cloned = [r for r in rows
              if r["first_conv"] in ("conv-000002", "conv-clone99")]
    # conv-000002 has 5 extractable turns (one NULL, one empty-string —
    # the empty extracted text still dedups); every one is duplicated
    # by the clone
    assert len(cloned) >= 4
    assert all(r["n_copies"] >= 2 and r["n_convs"] >= 2 for r in cloned)
    assert all(r["first_conv"] == "conv-000002" for r in cloned)


def test_e2e_clusters_pair_clone_with_original(spark, piped):
    rows = dedup_extracted_clusters(piped).collect()
    by_turn = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    orig = [(c, t) for (c, t) in by_turn if c == "conv-000002"]
    for (c, t) in orig:
        o, k = by_turn[(c, t)], by_turn.get(("conv-clone99", t))
        if k is None:       # the errored NULL turn has no dedup row
            continue
        # byte-identical extracted text with >= 3 words must share a
        # cluster; shingle-less turns (short/empty) stay singletons by
        # the library's documented eligibility rule
        if o["cluster_size"] > 1 or k["cluster_size"] > 1:
            assert o["cluster_id"] == k["cluster_id"]
            assert (o["is_canonical"], k["is_canonical"]).count(True) <= 1
    # at least one original/clone pair actually clustered
    assert any(by_turn[t]["cluster_size"] >= 2 for t in orig)
