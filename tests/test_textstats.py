"""BM25 search invariants + plan locks (relational/textstats.py).

Value-level correctness is the DuckDB twin in test_relational_oracle.py;
these pin the ranking semantics and the scale-shape of the plan."""

import math

from pyspark.sql import functions as F

from pdf_ocr_spark.relational.textstats import (
    BM25_B, BM25_K1, BM25_N_TERMS, BM25_TOPK, q_bm25_topk)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString() + \
        df._jdf.queryExecution().optimizedPlan().toString()


def test_bm25_ranking_semantics(spark):
    got = q_bm25_topk(spark, SF).toPandas()
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert len(got) <= BM25_TOPK and len(got) > 0
    assert got.bm25.is_monotonic_decreasing
    assert ((got.n_terms_matched >= 1)
            & (got.n_terms_matched <= BM25_N_TERMS)).all()
    # driver-side recompute of the winner's score pins the formula
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas().set_index("doc_id"))
    token_lists = {d: t.split(" ") for d, t in docs.text.items()}
    n_docs = len(docs)
    avgdl = sum(len(w) for w in token_lists.values()) / n_docs
    dfreq = {}
    for w in token_lists.values():
        for tok in set(w):
            dfreq[tok] = dfreq.get(tok, 0) + 1
    terms = sorted(dfreq, key=lambda x: (abs(dfreq[x] - n_docs / 2.0),
                                         x))[:BM25_N_TERMS]
    top = got.iloc[0]
    w = token_lists[top.doc_id]
    want = 0.0
    for term in terms:
        tf = w.count(term)
        if tf == 0:
            continue
        idf = math.log(1.0 + (n_docs - dfreq[term] + 0.5)
                       / (dfreq[term] + 0.5))
        want += idf * tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(w) / avgdl))
    assert abs(top.bm25 - want) < 1e-6
    # the winner's recomputed score must beat every non-listed doc's
    # (spot check 20 other docs)
    others = [d for d in docs.index if d not in set(got.doc_id)][:20]
    for did in others:
        ow = token_lists[did]
        s = 0.0
        for term in terms:
            tf = ow.count(term)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n_docs - dfreq[term] + 0.5)
                           / (dfreq[term] + 0.5))
            s += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(ow) / avgdl))
        # tolerance covers the rounded-vs-recomputed comparison plus
        # doc_id tie-breaking at the cutoff
        assert s <= got.bm25.iloc[-1] + 1e-6


def test_bm25_plan_shape(spark):
    """Query terms broadcast; top-k is TakeOrderedAndProject — never a
    global sort of the scored corpus; no cartesian, no Python UDF."""
    plan = _plan(q_bm25_topk(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_top_terms_semantics(spark):
    from pdf_ocr_spark.relational.textstats import (
        TFIDF_TOP_N, q_tfidf_top_terms)
    got = q_tfidf_top_terms(spark, SF).toPandas()
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas().set_index("doc_id"))
    assert set(got.doc_id) == set(docs.index)
    assert ((got["rank"] >= 1) & (got["rank"] <= TFIDF_TOP_N)).all()
    # per-doc ranks are 1..k with scores non-increasing
    for did, grp in got.groupby("doc_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert grp.tfidf.is_monotonic_decreasing or len(grp) == 1
    # driver-side recompute for 3 docs pins tf * ln(N/df) + the cutoff
    token_lists = {d: t.split(" ") for d, t in docs.text.items()}
    n_docs = len(docs)
    dfreq = {}
    for w in token_lists.values():
        for tok in set(w):
            dfreq[tok] = dfreq.get(tok, 0) + 1

    def round6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for did in list(docs.index)[:3]:
        w = token_lists[did]
        scores = sorted(
            ((round6(w.count(tok) * math.log(n_docs / dfreq[tok])), tok)
             for tok in set(w)),
            key=lambda st: (-st[0], st[1]))[:TFIDF_TOP_N]
        mine = got[got.doc_id == did].sort_values("rank")
        assert list(mine.term) == [tok for _, tok in scores]
        for (s, _), g in zip(scores, mine.tfidf):
            assert abs(s - g) < 1e-9


def test_tfidf_plan_shape(spark):
    """df-scalar broadcast; rank window partitioned by doc_id (no global
    sort of the scored terms); no cartesian blowup, no Python UDF."""
    from pdf_ocr_spark.relational.textstats import q_tfidf_top_terms
    plan = _plan(q_tfidf_top_terms(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- CJK-aware pre-tokenizer (VERDICT r4 #3) -------------------------------

_CJK_DOCS = [
    (0, "zh", "中文文档没有空格所以按词计数完全失败", "news"),
    (1, "en", "Hello world don't tokenize 123 badly!", "news"),
    (2, "mix", "mixed 中文 and English カタカナ text", "web"),
    (3, "code", "x += 42; // increment the counter", "web"),
    # vertical tab: Java \\s includes \\x0B, RE2's does not — the parity
    # trap the explicit whitespace class exists for (r5 review)
    (4, "vt", "fields\x0bseparated\x0bby vertical\x0btabs", "web"),
]


def _cjk_sf(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in _CJK_DOCS], pa.int64()),
        "lang": pa.array([r[1] for r in _CJK_DOCS]),
        "text": pa.array([r[2] for r in _CJK_DOCS]),
        "source": pa.array([r[3] for r in _CJK_DOCS]),
    }), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_pretok_cjk_parity_with_duckdb_twin(spark, tmp_path):
    """The Java and RE2 pre-tokenizer patterns must agree bit-for-bit ON
    CJK INPUT (the sf tables are ASCII, so the oracle gate alone never
    exercises the \\p{Han} classes)."""
    import duckdb

    from pdf_ocr_spark.relational.textstats import (
        SQL_TOKEN_COUNT_PRETOK, q_token_count_pretok)

    sf = _cjk_sf(tmp_path)
    got = q_token_count_pretok(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(SQL_TOKEN_COUNT_PRETOK).df()
    assert got.values.tolist() == want.values.tolist()
    # and the counts are the CJK-correct ones: doc 0 is 18 Han chars
    news = got[got.source == "news"].iloc[0]
    assert news.cjk_tokens == 18


def test_corpus_pack_pretok_budgets_cjk(spark, tmp_path):
    """count_mode='pretok' packs unspaced CJK by its real token count:
    the 18-char Chinese doc is 18 tokens, not the single 'token' the
    whitespace split sees."""
    from pdf_ocr_spark.relational.textstats import q_corpus_pack

    sf = _cjk_sf(tmp_path)
    ws = {r["doc_id"]: r["n_tokens"]
          for r in q_corpus_pack(spark, sf).collect()}
    pre = {r["doc_id"]: r["n_tokens"]
           for r in q_corpus_pack(spark, sf,
                                  count_mode="pretok").collect()}
    assert ws[0] == 1          # whitespace split: one giant "token"
    assert pre[0] == 18        # pre-tokenizer: one per Han char
    assert pre[1] >= 6         # English keeps sensible counts
    # oracle twin at the same mode agrees on the CJK fixture too
    import duckdb

    from pdf_ocr_spark.relational.textstats import make_corpus_pack_sql
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf}/documents.parquet'")
    want = {int(r[0]): int(r[2])
            for r in con.sql(make_corpus_pack_sql("pretok")).fetchall()}
    assert want == {k: int(v) for k, v in pre.items()}


def test_url_stats_counts_planted_and_organic(spark, tmp_path):
    """url_stats counts organic URLs in text plus the deterministic
    per-doc_id plants, and distinct domains across both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.relational.textstats import q_url_stats

    rows = [
        # doc 0: planted (doc_id%4==0 -> 2 urls, site0 + cdn0 domains)
        (0, "en", "no links in the body here", "news"),
        # doc 1: one organic url
        (1, "en", "visit https://example.com/page now", "news"),
        # doc 2: nothing
        (2, "en", "plain text", "web"),
        # doc 4: planted (site4 + cdn4)
        (4, "en", "body", "web"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
    }), str(tmp_path / "documents.parquet"))

    got = {r["source"]: r for r in q_url_stats(spark,
                                               str(tmp_path)).collect()}
    assert got["news"]["n_urls"] == 3          # 2 planted + 1 organic
    assert got["news"]["n_docs_with_urls"] == 2
    # domains: site0.example.org, cdn0.example.net, example.com
    assert got["news"]["n_domains"] == 3
    assert got["web"]["n_urls"] == 2
    assert got["web"]["n_docs_with_urls"] == 1
    assert got["web"]["n_domains"] == 2
    assert abs(got["news"]["avg_urls_per_doc"] - 1.5) < 1e-9


def test_count_mode_validation():
    """A typo'd count_mode fails loud in ALL three entry points instead
    of silently falling back to whitespace counting (r5 review)."""
    import pytest as _pytest

    from pdf_ocr_spark.relational.textstats import (
        check_count_mode, make_corpus_pack_sql)

    check_count_mode("ws")
    check_count_mode("pretok")
    with _pytest.raises(ValueError):
        check_count_mode("pretoken")
    with _pytest.raises(ValueError):
        make_corpus_pack_sql("Pretok")


def test_curate_count_mode_validation(spark):
    import pytest as _pytest

    from pdf_ocr_spark.curate import curate_corpus

    ext = spark.createDataFrame(
        [("c", 0, "some words")],
        "conv_id string, turn_idx int, extracted_text string")
    with _pytest.raises(ValueError):
        curate_corpus(ext, count_mode="pretoken")


def test_pretok_randomized_unicode_parity(spark):
    """Batched randomized parity sweep for the pre-tokenizer twins:
    300 deterministic random strings over an adversarial alphabet —
    ASCII, the whitespace zoo (incl. \\x0B, the Java-\\s/RE2-\\s trap,
    and U+3000 ideographic space), common Han, Han extensions A and B
    (astral plane), kana, cyrillic, emoji — must count identically in
    Spark (Java regex) and DuckDB (RE2). One Spark job, not
    per-example."""
    import random

    import duckdb
    import pyarrow as pa

    from pdf_ocr_spark.relational.textstats import (
        _PRETOK_RE2_SQL, pretok_count)

    rng = random.Random(7)
    ws = " \t\n\x0b\f\r　 "
    pools = [
        lambda: chr(rng.randint(0x20, 0x7E)),
        lambda: ws[rng.randint(0, len(ws) - 1)],
        lambda: chr(rng.randint(0x4E00, 0x9FFF)),
        lambda: chr(rng.randint(0x3400, 0x4DBF)),
        lambda: chr(rng.randint(0x20000, 0x2A6DF)),
        lambda: chr(rng.randint(0x3040, 0x30FF)),
        lambda: chr(rng.randint(0x0400, 0x04FF)),
        lambda: chr(rng.randint(0x1F300, 0x1F5FF)),
    ]
    texts = ["".join(pools[rng.randint(0, len(pools) - 1)]()
                     for _ in range(rng.randint(0, 40)))
             for _ in range(300)]

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    got = {r["i"]: r["n"]
           for r in df.select("i",
                              pretok_count("text").alias("n")).collect()}
    con = duckdb.connect()
    con.register("tx", pa.table({"i": list(range(len(texts))),
                                 "text": texts}))
    want = {i: n for i, n in con.execute(
        "select i, len(regexp_extract_all(text, '" + _PRETOK_RE2_SQL
        + "')) from tx").fetchall()}
    assert got == want
