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


# --- semantic dedup over the pipeline's own embeddings (VERDICT r4 #2) ----

def _paraphrase_frame(spark):
    """A paraphrase pair MinHash structurally misses: every 4th word
    substituted kills 3 word-3-gram shingles per substitution (Jaccard
    ~0.14 << 0.5) but keeps 75% of unigram + 50% of bigram mass
    (hashed-BoW cosine ~0.6-0.7)."""
    base = [f"word{i:03d}" for i in range(40)]
    para = list(base)
    for i in range(0, 40, 4):
        para[i] = f"syn{i:03d}"
    return _frame(spark, [
        ("cA", 0, " ".join(base)),
        ("cB", 0, " ".join(para)),
        ("cC", 0, " ".join(f"other{i:03d}" for i in range(40))),
        ("cD", 0, " ".join(f"third{i:03d}" for i in range(40))),
    ])


def test_embed_docs_unit_norm_and_signed_geometry(spark):
    """Signed feature hashing: unit norms, identical texts at cosine
    1.0, disjoint-vocab texts near 0 (the sign is what kills the
    unsigned-count baseline of ~n/(n+D)), deterministic across calls."""
    import numpy as np

    from pdf_ocr_spark.embed import embed_docs
    from pdf_ocr_spark.dedup_extracted import turns_as_docs

    d = turns_as_docs(_paraphrase_frame(spark)).select("doc_id", "text")
    emb = {r["doc_id"]: np.array(r["embedding"])
           for r in embed_docs(d).collect()}
    assert len(emb) == 4
    for v in emb.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)
    ids = {r["conv_id"]: r["doc_id"]
           for r in turns_as_docs(_paraphrase_frame(spark)).collect()}
    cos_para = float(emb[ids["cA"]] @ emb[ids["cB"]])
    cos_unrel = float(emb[ids["cA"]] @ emb[ids["cC"]])
    assert cos_para > 0.5            # paraphrase keeps most gram mass
    assert abs(cos_unrel) < 0.25     # signs cancel across disjoint vocab
    emb2 = {r["doc_id"]: np.array(r["embedding"])
            for r in embed_docs(d).collect()}
    for k in emb:
        assert np.array_equal(emb[k], emb2[k])


def test_semdedup_extracted_catches_paraphrase_minhash_misses(spark):
    ext = _paraphrase_frame(spark)
    # the MinHash cluster path sees 4 singletons...
    cl = dedup_extracted_clusters(ext).collect()
    assert all(r["cluster_size"] == 1 for r in cl)
    # ...the embedding path pairs cA/cB and keeps exactly one of them
    from pdf_ocr_spark.dedup_extracted import semdedup_extracted
    sd = {(r["conv_id"], r["turn_idx"]): r["keep"]
          for r in semdedup_extracted(ext, n_cents=2).collect()}
    assert len(sd) == 4
    assert sd[("cC", 0)] and sd[("cD", 0)]
    assert sorted([sd[("cA", 0)], sd[("cB", 0)]]) == [False, True]


def test_semdedup_extracted_excludes_error_turns(spark):
    ext = spark.createDataFrame(
        [("cA", 0, "alpha beta gamma delta", "plain"),
         ("cE", 0, "", "error")],
        "conv_id string, turn_idx int, extracted_text string, "
        "method string")
    from pdf_ocr_spark.dedup_extracted import semdedup_extracted
    rows = semdedup_extracted(ext, n_cents=1).collect()
    assert [(r["conv_id"], r["keep"]) for r in rows] == [("cA", True)]
