"""MinHash/LSH recall against brute-force Jaccard ground truth.

Production parameters (64 hashes / 16 bands, r=4) must catch near-duplicate
pairs: P(candidate | J) = 1 - (1 - J^4)^16 is 0.986 at J=0.7 and 0.9996 at
J=0.8. The corpus is seeded so the test is deterministic.
"""

import itertools
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_ocr_spark.relational.dedup import q_dedup_minhash


def _shingle_set(text: str) -> set:
    w = text.split(" ")
    if len(w) < 3:
        return set()
    return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = random.Random(1234)
    vocab = [f"w{i:03d}" for i in range(400)]
    docs = []
    for b in range(25):
        base = [rng.choice(vocab) for _ in range(60)]
        docs.append(" ".join(base))
        # near-dup: mutate k words -> J roughly (60-3k)/(60+...) per k
        for k in (2, 5, 12):
            mut = list(base)
            for pos in rng.sample(range(60), k):
                mut[pos] = rng.choice(vocab)
            docs.append(" ".join(mut))
    d = tmp_path_factory.mktemp("mh")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(d / "documents.parquet"))

    truth = {}
    shingles = [_shingle_set(t) for t in docs]
    for i, j in itertools.combinations(range(len(docs)), 2):
        inter = len(shingles[i] & shingles[j])
        if inter:
            union = len(shingles[i] | shingles[j])
            truth[(i, j)] = inter / union
    return {"dir": str(d), "truth": truth}


def test_recall_at_production_parameters(spark, corpus):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in q_dedup_minhash(spark, corpus["dir"]).collect()}
    true_near = {p: j for p, j in corpus["truth"].items() if j >= 0.7}
    assert len(true_near) >= 25  # the fixture actually contains near-dups
    caught = [p for p in true_near if p in got]
    recall = len(caught) / len(true_near)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(true_near)} pairs"
    # verified Jaccard values are exact (not estimates) for caught pairs
    for p in caught:
        assert got[p] == pytest.approx(true_near[p], abs=1e-6)


def test_demo_parameters_still_work_but_recall_drops_structurally(
        spark, corpus):
    """The 8/2 demo shape remains available via parameters; its candidate
    set can only be a subset of what more bands catch at equal r... (8/2
    has r=4 like 64/16, just 2 bands instead of 16 — strictly fewer
    collision chances)."""
    demo = {(r["doc_a"], r["doc_b"])
            for r in q_dedup_minhash(spark, corpus["dir"], n_hashes=8,
                                     n_bands=2).collect()}
    prod = {(r["doc_a"], r["doc_b"])
            for r in q_dedup_minhash(spark, corpus["dir"]).collect()}
    assert demo <= prod  # bands 0-1 of prod ARE the demo bands (shared seeds)


def test_cluster_transitivity_chain(spark, tmp_path):
    """Connected components must merge a near-dup CHAIN a~b~c into one
    cluster even when the a~c Jaccard is below threshold — the transitive
    case pairwise dedup misses. Canonical = min doc_id."""
    from pdf_ocr_spark.relational.dedup import q_dedup_clusters
    words = [f"t{i:03d}" for i in range(90)]
    a = words[0:60]            # 0..59
    b = words[15:75]           # 45 shared with a (J ~ 0.6)
    c = words[30:90]           # 45 shared with b, 30 with a (J ~ 0.33)
    other = [f"z{i}" for i in range(60)]
    docs = [" ".join(a), " ".join(b), " ".join(c), " ".join(other)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in
            q_dedup_clusters(spark, str(tmp_path)).collect()}
    assert rows[0]["cluster_id"] == rows[1]["cluster_id"] \
        == rows[2]["cluster_id"] == 0
    assert rows[0]["cluster_size"] == 3
    assert rows[0]["is_canonical"] and not rows[1]["is_canonical"]
    assert rows[3]["cluster_id"] == 3 and rows[3]["cluster_size"] == 1


def _bruteforce_hamming_pairs(path: str, n_bits: int,
                              max_hamming: int = 3) -> dict:
    """Driver-side ground truth: full-hash SimHash fingerprints (no
    % MOD reduction — every bit informative) and all-pairs popcount."""
    import hashlib
    import pyarrow.parquet as pq

    tbl = pq.read_table(path + "/documents.parquet")
    sims = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(),
                            tbl["text"].to_pylist()):
        toks = {t for t in text.split(" ") if t}
        if not toks:
            continue
        votes = [0] * n_bits
        for tok in toks:
            h2 = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for k in range(n_bits):
                votes[k] += 1 if (h2 >> k) & 1 else -1
        sims[doc_id] = sum((1 << k) for k in range(n_bits)
                           if votes[k] >= 0)
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= max_hamming:
                want[(a, b)] = h
    return want


def test_simhash_hamming_exhaustive_vs_bruteforce(spark, corpus):
    """The 4x8-bit band join must be EXHAUSTIVE for Hamming <= 3
    (pigeonhole guarantee — unlike MinHash there is no probabilistic
    recall): the full result must equal a driver-side brute force over
    all pairs, distances included."""
    from pdf_ocr_spark.relational.dedup import q_dedup_simhash_hamming

    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in q_dedup_simhash_hamming(spark, corpus["dir"])
           .collect()}
    assert got == _bruteforce_hamming_pairs(corpus["dir"], 32)


def test_simhash_hamming_60bit_production_widening(spark, corpus):
    """The documented production widening (n_bits=60, 4 x 15-bit bands
    ~ Manku's 64/16 point) must actually run — no LongType sign-bit
    overflow — and stay exhaustive vs brute force (VERDICT r3 #2)."""
    from pdf_ocr_spark.relational.dedup import q_dedup_simhash_hamming

    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in q_dedup_simhash_hamming(spark, corpus["dir"],
                                            n_bits=60).collect()}
    assert got == _bruteforce_hamming_pairs(corpus["dir"], 60)


def test_simhash_hamming_high_bits_informative(spark, corpus):
    """ADVICE r3: fingerprints must use the full hash — bits 30+ must
    not be identically zero across the corpus (with the old % MOD
    reduction they were, making band 3 effectively 6-bit)."""
    import pyarrow.parquet as pq
    from pdf_ocr_spark.relational.dedup import _simhash_of

    docs = spark.read.parquet(corpus["dir"] + "/documents.parquet")
    sims = [r["simhash"] for r in
            _simhash_of(docs, 32, full_hash=True).collect()]
    assert any(s >> 30 for s in sims)
    with pytest.raises(AssertionError):
        _simhash_of(docs, 61, full_hash=True)
    with pytest.raises(AssertionError):
        _simhash_of(docs, 31)


def test_simhash_hamming_band_bucket_cap(spark, tmp_path):
    """max_band_bucket bounds the simhash band join the same way the
    MinHash cap does: fewer candidate pairs survive, with the overflow
    logged."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_ocr_spark.relational.dedup import q_dedup_simhash_hamming
    base = [f"w{i:02d}" for i in range(40)]
    docs = []
    for d in range(40):
        mut = list(base)
        mut[d % 40] = f"m{d:03d}"
        docs.append(" ".join(mut))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    uncapped = q_dedup_simhash_hamming(spark, str(tmp_path)).count()
    capped = q_dedup_simhash_hamming(spark, str(tmp_path),
                                     max_band_bucket=5).count()
    assert uncapped > 0
    assert capped < uncapped


def test_connected_components_long_chain_converges_by_pointer_jumping(
        spark):
    """A 300-node path graph has diameter 299: plain min-label
    propagation would need ~300 rounds and now raises at max_iters=20.
    The pointer-jumping step (r3) makes rounds O(log diameter), so the
    chain must fully converge to cluster 0 within the default budget."""
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.util import connected_components
    n = 300
    nodes = spark.range(n).select(F.col("id").alias("vid"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
    rows = connected_components(nodes, edges, "vid",
                                max_iters=20).collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 0 for r in rows)
    assert all(r["cluster_size"] == n for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1


def test_connected_components_matches_union_find_on_random_graph(spark):
    """Cross-check the distributed fixpoint against a driver-side
    union-find on a random graph (multiple components, cycles, isolated
    nodes)."""
    import random as rnd
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.util import connected_components
    rng = rnd.Random(5)
    n = 120
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(80)}
    pairs = [(a, b) for a, b in pairs if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in range(n)}

    nodes = spark.range(n).select(F.col("id").alias("vid"))
    e = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long")
    got = {r["vid"]: r["cluster_id"] for r in
           connected_components(nodes, e, "vid").collect()}
    assert got == want


def test_connected_components_star_on_star_of_chains(spark):
    """VERDICT r3 #7: the large-star/small-star variant on the
    adversarial shape it exists for — a hub (node 0) with 8 chains of
    30 nodes hanging off it: high degree at the hub AND diameter 60.
    Cross-checked against a driver-side union-find, and against the
    default pointer-jumping variant (same min-label fixpoint)."""
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.util import connected_components
    chains, length = 8, 30
    pairs = []
    nid = 1
    for _ in range(chains):
        prev = 0
        for _ in range(length):
            pairs.append((prev, nid))
            prev = nid
            nid += 1
    # plus two disjoint 3-cliques and an isolated node, so the star
    # forest has >1 component
    a = nid
    pairs += [(a, a + 1), (a + 1, a + 2), (a, a + 2)]
    b = a + 3
    pairs += [(b, b + 1), (b + 1, b + 2), (b, b + 2)]
    n = b + 4  # b+3 is isolated

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {v: find(v) for v in range(n)}

    nodes = spark.range(n).select(F.col("id").alias("vid"))
    e = spark.createDataFrame(
        pairs + [(v, u) for u, v in pairs], "src long, dst long")
    star = connected_components(nodes, e, "vid",
                                algorithm="star").collect()
    assert {r["vid"]: r["cluster_id"] for r in star} == want
    ptr = connected_components(nodes, e, "vid").collect()
    assert sorted(map(tuple, star)) == sorted(map(tuple, ptr))


def test_connected_components_star_matches_union_find_random(spark):
    """Same random-graph union-find cross-check as the pointer variant,
    through the algorithm='star' path (cycles, multiple components,
    isolated nodes, edgeless early-exit exercised by isolated nodes)."""
    import random as rnd
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.util import connected_components
    rng = rnd.Random(7)
    n = 120
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(80)}
    pairs = [(a, b) for a, b in pairs if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in range(n)}

    nodes = spark.range(n).select(F.col("id").alias("vid"))
    e = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long")
    got = {r["vid"]: r["cluster_id"] for r in
           connected_components(nodes, e, "vid",
                                algorithm="star").collect()}
    assert got == want


def test_connected_components_star_edgeless_and_bad_algorithm(spark):
    """Edgeless graph converges round-0 to all singletons; an unknown
    algorithm name raises immediately."""
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.util import connected_components
    nodes = spark.range(5).select(F.col("id").alias("vid"))
    edges = spark.createDataFrame([], "src long, dst long")
    rows = connected_components(nodes, edges, "vid",
                                algorithm="star").collect()
    assert {r["vid"]: r["cluster_id"] for r in rows} == {
        i: i for i in range(5)}
    assert all(r["cluster_size"] == 1 and r["is_canonical"]
               for r in rows)
    with pytest.raises(ValueError, match="unknown CC algorithm"):
        connected_components(nodes, edges, "vid", algorithm="frobnicate")


def test_connected_components_raises_when_budget_truly_exceeded(spark):
    """ADVICE r2: an unconverged labeling must never be returned
    silently. With max_iters=1 a 10-node chain cannot finish — the call
    must raise instead of emitting split clusters."""
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.util import connected_components
    n = 10
    nodes = spark.range(n).select(F.col("id").alias("vid"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, "vid", max_iters=1)


def test_embedding_cluster_positive_case(spark, tmp_path):
    """The driver-testdata embeddings hold no cosine>=0.99 near-dups, so
    the oracle check exercises only the singleton path; this synthetic
    fixture proves the edge path: three near-identical vectors cluster
    under the minimum vec_id, the unrelated vector stays a singleton."""
    import numpy as np
    from pdf_ocr_spark.relational.similarity import (
        q_dedup_embedding_clusters)
    rng = np.random.RandomState(7)
    base = rng.randn(64).astype(np.float32)
    vecs = [base, base + rng.randn(64).astype(np.float32) * 0.001,
            rng.randn(64).astype(np.float32), base * 1.0001]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 0], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    got = {r["vec_id"]: (r["cluster_id"], r["cluster_size"],
                         r["is_canonical"])
           for r in q_dedup_embedding_clusters(spark,
                                               str(tmp_path)).collect()}
    assert got[0] == (0, 3, True)
    assert got[1] == (0, 3, False) and got[3] == (0, 3, False)
    assert got[2] == (2, 1, True)


def test_degenerate_identical_corpus_candidates_stay_linear(
        spark, tmp_path):
    """LSH banding's degenerate case (VERDICT r2 #3): 1k byte-identical
    docs share every band key -> the naive algorithm would push ~500k
    candidate pairs into the Jaccard verify stage. The exact-dedup
    pre-pass collapses them to ONE representative, so the verify stage
    sees zero intra-group candidates; the query output still reports all
    pairs (jaccard 1.0) via reassociation."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pdf_ocr_spark.relational.dedup import (
        _shingles_of, minhash_band_candidates, q_dedup_minhash)

    same = " ".join(f"dup{i:02d}" for i in range(40))
    distinct = [" ".join(f"x{d}w{i:02d}" for i in range(40))
                for d in range(3)]
    docs = [same] * 1000 + distinct
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    # verify-stage candidate count at rep level: O(distinct texts), not
    # O(n^2) — exactly what the pre-pass guarantees
    d = spark.read.parquet(str(tmp_path / "documents.parquet"))
    groups = d.select("doc_id", F.md5("text").alias("th"))
    reps = groups.groupBy("th").agg(F.min("doc_id").alias("rep_id"))
    rep_docs = d.join(reps.select(F.col("rep_id").alias("doc_id")),
                      "doc_id", "left_semi")
    assert rep_docs.count() == 4  # 1 rep for the 1k copies + 3 distinct
    n_cand = minhash_band_candidates(_shingles_of(rep_docs), 64, 16) \
        .count()
    assert n_cand <= 6  # at most rep-pair combinations, never ~500k

    # output parity: all 1000*999/2 identical pairs present at J=1.0
    out = q_dedup_minhash(spark, str(tmp_path))
    assert out.count() == 1000 * 999 // 2
    assert out.filter("jaccard <> 1.0").count() == 0
    sample = out.filter("doc_a = 0 and doc_b = 999").collect()
    assert len(sample) == 1 and sample[0]["jaccard"] == 1.0

    # the inverted-index path shares the pre-pass: without it, the 1k
    # copies would stopword ALL their own shingles (df=1000 > maxdf=50)
    # and silently miss every jaccard-1.0 pair (code-review r3)
    from pdf_ocr_spark.relational.dedup import q_dedup_ngram_jaccard
    ng = q_dedup_ngram_jaccard(spark, str(tmp_path))
    assert ng.filter("jaccard = 1.0").count() == 1000 * 999 // 2


def test_band_bucket_cap_bounds_near_identical_blowup(spark, tmp_path):
    """max_band_bucket: for near-identical-but-UNEQUAL corpora (one word
    mutated per doc — exact dedup can't collapse them) the optional cap
    drops oversized band buckets, bounding candidates at a logged recall
    cost."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_ocr_spark.relational.dedup import q_dedup_minhash

    base = [f"near{i:02d}" for i in range(50)]
    docs = []
    for d in range(60):
        mut = list(base)
        mut[d % 50] = f"mut{d:03d}"
        docs.append(" ".join(mut))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    uncapped = q_dedup_minhash(spark, str(tmp_path)).count()
    capped = q_dedup_minhash(spark, str(tmp_path),
                             max_band_bucket=10).count()
    # essentially all pairs band-collide (a couple of double-mutation
    # pairs may miss): quadratic candidate load
    assert uncapped >= 1700
    assert capped < uncapped  # the cap actually bounded the join


def test_low_similarity_pairs_filtered_structurally(spark, corpus):
    """LSH precision: pairs far below the near-dup threshold should mostly
    NOT become candidates (banding cutoff, not post-filtering)."""
    got = {(r["doc_a"], r["doc_b"])
           for r in q_dedup_minhash(spark, corpus["dir"]).collect()}
    low = [p for p, j in corpus["truth"].items() if j < 0.2]
    leaked = [p for p in low if p in got]
    # expected leak rate at J=0.2: 1-(1-0.0016)^16 ~ 2.5%
    assert len(leaked) <= max(5, 0.1 * len(low))


def test_ngram_jaccard_counts_shared_stopworded_shingles(spark,
                                                         tmp_path):
    """r4 count-filter verify: true Jaccard = shared-rare +
    shared-NONRARE shingles. Docs 0/1 share the stopworded phrase
    'the quick brown fox' (df > maxdf) plus rare content; counting
    only rare shared shingles would give 3/9 = 0.333 < 0.5 and drop
    the pair — the non-rare re-join must restore the exact 5/7 and
    keep it. Cross-checked against a driver-side brute-force Jaccard
    over full shingle sets."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_ocr_spark.relational.dedup import q_dedup_ngram_jaccard

    docs = [
        "the quick brown fox alpha beta gamma delta",
        "the quick brown fox alpha beta gamma epsilon",
    ]
    for i in range(6):
        docs.append(f"the quick brown fox junk{i} filler{i} pad{i}")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    def sh(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            A, B = sh(docs[a]), sh(docs[b])
            j = len(A & B) / len(A | B)
            import math
            j6 = math.floor(j * 1000000.0 + 0.5) / 1000000.0
            if j6 >= 0.5 and A & B:
                want[(a, b)] = j6
    assert want == {(0, 1): math.floor(5 / 7 * 1e6 + 0.5) / 1e6}

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in q_dedup_ngram_jaccard(
               spark, str(tmp_path), maxdf=2).collect()}
    assert got == want


def test_corpus_similarity_estimator(spark):
    """The source-pair MinHash estimate must (a) reproduce a driver-side
    signature recompute exactly and (b) track true shingle Jaccard within
    the sketch's standard error on the real corpus."""
    import hashlib

    from pdf_ocr_spark.relational.dedup import q_corpus_similarity
    from pdf_ocr_spark.relational.util import (
        MINHASH_A, MINHASH_B, MINHASH_N_HASHES, MOD)

    sf = "/root/testdata/sf0.001"
    got = q_corpus_similarity(spark, sf).toPandas()
    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .select("source", "text").toPandas())
    shingles = {}
    for _, row in docs.iterrows():
        w = row.text.split(" ")
        if len(w) < 3:
            continue
        shingles.setdefault(row.source, set()).update(
            " ".join(w[i:i + 3]) for i in range(len(w) - 2))
    n_src = len(shingles)
    assert len(got) == n_src * (n_src - 1) // 2

    def sig(ss):
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MOD
              for s in ss]
        return [min((a * h + b) % MOD for h in hs)
                for a, b in zip(MINHASH_A[:MINHASH_N_HASHES],
                                MINHASH_B[:MINHASH_N_HASHES])]

    sigs = {s: sig(ss) for s, ss in shingles.items()}
    for _, row in got.head(8).iterrows():
        n_match = sum(x == y for x, y in zip(sigs[row.source_a],
                                             sigs[row.source_b]))
        assert row.n_match == n_match
        a, b = shingles[row.source_a], shingles[row.source_b]
        true_j = len(a & b) / len(a | b)
        # 64-hash sketch: se = sqrt(J(1-J)/64) <= 0.0625; allow 4 se
        assert abs(row.jaccard_est - true_j) <= 0.25


def test_corpus_similarity_plan(spark):
    """The only cross join is the broadcast signature self-pairing; the
    corpus-sized side never cross-joins and no Python UDF appears."""
    from pdf_ocr_spark.relational.dedup import q_corpus_similarity
    df = q_corpus_similarity(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # signature aggregation must be partial (map-side combine)
    assert "partial_min" in plan


def test_cardinality_estimate(spark):
    """MinCount estimator: exact counts pinned against a driver-side
    recompute; the R=64 estimate must land within 4x its ~12.5%
    standard error on every source."""
    from pdf_ocr_spark.relational.dedup import q_cardinality_estimate

    sf = "/root/testdata/sf0.001"
    got = q_cardinality_estimate(spark, sf).toPandas()
    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .select("source", "text").toPandas())
    exact = {}
    for _, row in docs.iterrows():
        w = row.text.split(" ")
        if len(w) < 3:
            continue
        exact.setdefault(row.source, set()).update(
            " ".join(w[i:i + 3]) for i in range(len(w) - 2))
    assert len(got) == len(exact)
    for _, r in got.iterrows():
        assert r.n_distinct == len(exact[r.source])
        assert r.rel_error <= 0.5
        assert abs(r.estimate - r.n_distinct) / r.n_distinct \
            == pytest.approx(r.rel_error, abs=1e-6)


def test_cardinality_estimate_plan(spark):
    """The sketch must be a partial (map-side) min-agg with no Python
    UDF; the exact count rides in the same aggregate."""
    from pdf_ocr_spark.relational.dedup import q_cardinality_estimate
    df = q_cardinality_estimate(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_max_group_pairs_caps_intra_expansion(spark, tmp_path, caplog):
    """VERDICT r4 #5: pair-output semantics are quadratic per duplicate
    group by definition. ``max_group_pairs`` bounds the intra-group
    expansion (deterministically — lowest doc_ids survive) with a logged
    warning; inter-group fan-out and groups under the cap are untouched;
    the cluster-label form stays linear (one row per doc) and is NOT
    affected by any cap."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_ocr_spark.relational.dedup import (
        q_dedup_clusters, q_dedup_minhash)

    text_a = " ".join(f"viral{i:02d}" for i in range(40))
    words_b = text_a.split(" ")
    words_b[20] = "mutated"
    text_b = " ".join(words_b)
    # 30 copies of A (ids 0-29), 4 copies of near-dup B (30-33),
    # 2 unrelated distinct docs (34-35)
    docs = [text_a] * 30 + [text_b] * 4 + [
        " ".join(f"x{d}y{i:02d}" for i in range(40)) for d in range(2)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    uncapped = q_dedup_minhash(spark, str(tmp_path)).toPandas()
    # intra A 435 + intra B 6 + inter A-B fan-out 120
    assert len(uncapped) == 30 * 29 // 2 + 4 * 3 // 2 + 30 * 4

    with caplog.at_level(logging.WARNING,
                         logger="pdf_ocr_spark.relational.dedup"):
        capped = q_dedup_minhash(spark, str(tmp_path),
                                 max_group_pairs=10).toPandas()
    assert any("max_group_pairs" in r.message for r in caplog.records)
    # m_cap = 5: group A intra capped at C(5,2)=10 (lowest ids 0-4);
    # group B (4 <= m_cap) keeps all 6; inter fan-out NOT capped
    assert len(capped) == 10 + 6 + 30 * 4
    intra_a = capped[(capped.doc_a < 30) & (capped.doc_b < 30)]
    assert len(intra_a) == 10
    assert intra_a.doc_a.max() <= 4 and intra_a.doc_b.max() <= 4
    inter = capped[(capped.doc_a < 30) & (capped.doc_b >= 30)
                   & (capped.doc_b < 34)]
    assert len(inter) == 120

    # the linear production form: one row per doc, viral group intact
    cl = q_dedup_clusters(spark, str(tmp_path)).toPandas()
    assert len(cl) == len(docs)
    assert (cl[cl.doc_id < 34].cluster_id == 0).all()
    assert (cl[cl.doc_id >= 34].cluster_id == cl[cl.doc_id >= 34].doc_id) \
        .all()
