"""Curation-op invariants + plan locks (relational/curation.py).

The value-level correctness gate is tests/test_relational_oracle.py (DuckDB
twins); these tests pin the semantic invariants the oracle can't express
(non-vacuity, scrub completeness, plan shape at scale)."""

import re

import pytest
from pyspark.sql import functions as F

from pdf_ocr_spark.relational.curation import (
    CC_RE, CONTAM_EVAL_PCT, EMAIL_RE, IP_RE, KEY_RE, PHONE_RE,
    _CC_INVALID, _CC_VALID, _luhn_count_expr,
    q_contamination_check, q_json_props_agg, q_pii_redact,
    q_repetition_stats)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString() + \
        df._jdf.queryExecution().optimizedPlan().toString()


def test_repetition_stats_invariants(spark):
    rows = q_repetition_stats(spark, SF).toPandas()
    assert len(rows) > 0
    assert ((rows.dup_2gram_frac >= 0) & (rows.dup_2gram_frac <= 1)).all()
    assert ((rows.dup_3gram_frac >= 0) & (rows.dup_3gram_frac <= 1)).all()
    # non-vacuous both ways: the corpus contains repetitive and clean docs
    assert rows.repetitive.any() and not rows.repetitive.all()
    assert (rows.dup_2gram_frac > 0).any()


def test_repetition_stats_is_shuffle_free(spark):
    """The metrics are one projection over the scan: no join, no explode,
    no aggregation exchange (the only exchange allowed is the final
    presentation orderBy's range partitioning)."""
    plan = _plan(q_repetition_stats(spark, SF))
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode: grams stay in-row
    assert "hashpartitioning" not in plan


def test_contamination_check_semantics(spark):
    got = q_contamination_check(spark, SF).toPandas()
    assert len(got) > 0  # planted near-dups straddle the split
    assert (got.n_contaminated <= got.n_grams).all()
    assert ((got.contaminated_frac > 0)
            & (got.contaminated_frac <= 1)).all()
    # contaminated docs must all be train-split docs
    split = (spark.read.parquet(f"{SF}/documents.parquet")
             .select("doc_id",
                     F.pmod(F.conv(F.substring(F.md5(F.concat(
                         F.lit("split:"),
                         F.col("doc_id").cast("string"))), 1, 15),
                         16, 10).cast("long"), F.lit(100)).alias("b"))
             .toPandas().set_index("doc_id").b)
    assert (split.loc[got.doc_id] < 100 - CONTAM_EVAL_PCT).all()


def test_contamination_check_broadcasts_eval_side(spark):
    """The broadcast hint encodes the fixed-size-benchmark contract: it
    applies ONLY when the caller supplies eval_grams; the self-derived
    default is corpus-fraction-sized, so no hint is forced and AQE sizes
    the join (ADVICE r4). Neither path may go cartesian."""
    supplied = spark.createDataFrame(
        [(1,), (2,), (3,)], "h long")
    plan = _plan(q_contamination_check(spark, SF, eval_grams=supplied))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    default_plan = _plan(q_contamination_check(spark, SF))
    assert "CartesianProduct" not in default_plan
    assert "BroadcastNestedLoop" not in default_plan
    # no FORCED broadcast of the corpus-derived side: the optimized plan
    # must not carry a broadcast hint on the eval subtree (AQE may still
    # pick broadcast at runtime from observed sizes, which is the point)
    assert "ResolvedHint" not in default_plan


def _plant(did: int, text: str) -> str:
    """Python twin of the deterministic plant expressions in
    q_pii_redact / SQL_PII_REDACT (kept in sync by the md5 pin below)."""
    import hashlib
    out = text
    if did % 7 == 0:
        out += f" contact user{did}@example.com"
    if did % 11 == 0:
        out += f" call {did % 900 + 100:03d}-555-{did % 10000:04d}"
    if did % 5 == 0:
        out += f" src 10.{did % 200}.{did % 250}.{did % 100}"
    if did % 13 == 0:
        out += " pay " + (_CC_VALID[0] if did % 2 == 0
                          else _CC_VALID[1]) + " ok"
    if did % 17 == 0:
        out += f" ref {_CC_INVALID} end"
    if did % 19 == 0:
        out += " token sk_" + hashlib.md5(
            str(did).encode()).hexdigest()[:20]
    return out


def test_pii_redact_counts_and_scrub(spark):
    got = q_pii_redact(spark, SF).toPandas().set_index("doc_id")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id").toPandas().doc_id)
    for did in docs:
        assert got.loc[did, "n_emails"] == (1 if did % 7 == 0 else 0)
        assert got.loc[did, "n_phones"] == (1 if did % 11 == 0 else 0)
        assert got.loc[did, "n_ips"] == (1 if did % 5 == 0 else 0)
        # Luhn-validated count: the %17 INVALID plant must NOT count
        assert got.loc[did, "n_ccs"] == (1 if did % 13 == 0 else 0)
        assert got.loc[did, "n_keys"] == (1 if did % 19 == 0 else 0)
    # scrub completeness: re-apply the production regexes python-side to a
    # sample of planted texts and pin the md5 the query reported
    import hashlib
    sample = (spark.read.parquet(f"{SF}/documents.parquet")
              .filter((F.col("doc_id") % 77 == 0))
              .select("doc_id", "text").toPandas())
    assert len(sample) > 0
    for _, r in sample.iterrows():
        did = int(r.doc_id)
        red = _plant(did, r.text)
        for pat, repl in ((EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"),
                          (IP_RE, "<IP>"), (CC_RE, "<CC>"),
                          (KEY_RE, "<KEY>")):
            red = re.sub(pat, repl, red)
        for pat in (EMAIL_RE, PHONE_RE, IP_RE, CC_RE, KEY_RE):
            assert not re.search(pat, red)
        assert got.loc[did, "redacted_md5"] == \
            hashlib.md5(red.encode()).hexdigest()


def test_pii_extended_patterns_adversarial(spark):
    """Adversarial rows for the r5 pattern extensions: out-of-range IPv4
    octets, Luhn-invalid cards, separator-variant valid cards, too-short
    API keys, and a phone number that must NOT read as a card."""
    rows = [
        ("bad ip 999.1.1.1 ok",           0, 0, 0),   # octet > 255
        ("edge ip 255.255.255.255",       1, 0, 0),
        ("valid cc 4111111111111111",     0, 1, 0),
        ("valid cc 5500 0055 5555 5559",  0, 1, 0),
        ("valid cc 4111-1111-1111-1111",  0, 1, 0),   # dash separators
        ("invalid cc 4111111111111112",   0, 0, 0),   # Luhn fails
        ("short 123-456-7890 num",        0, 0, 0),   # phone shape, <13
        ("key sk_0123456789abcdef01",     0, 0, 1),
        ("short key sk_0123456789",       0, 0, 0),   # <16 token chars
        ("key api_ABCDEFGHIJKLMNOPQR",    0, 0, 1),
    ]
    df = spark.createDataFrame([(t,) for t, *_ in rows], "ptext string")
    ip_sql = IP_RE.replace("\\", "\\\\")
    key_sql = KEY_RE.replace("\\", "\\\\")
    cc_sql = CC_RE.replace("\\", "\\\\")
    got = df.select(
        "ptext",
        F.expr(f"size(regexp_extract_all(ptext, '{ip_sql}', 0))")
        .alias("n_ips"),
        F.expr(_luhn_count_expr("ptext", cc_sql)).alias("n_ccs"),
        F.expr(f"size(regexp_extract_all(ptext, '{key_sql}', 0))")
        .alias("n_keys")).toPandas().set_index("ptext")
    for text, n_ip, n_cc, n_key in rows:
        assert got.loc[text, "n_ips"] == n_ip, text
        assert got.loc[text, "n_ccs"] == n_cc, text
        assert got.loc[text, "n_keys"] == n_key, text


def test_pii_redact_is_map_side(spark):
    plan = _plan(q_pii_redact(spark, SF))
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    # regex work stays in whole-stage codegen (no Python UDF stage)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_json_props_agg_totals(spark):
    got = q_json_props_agg(spark, SF).toPandas()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert got.n_events.sum() == n_events
    assert (got.sum_k > 0).all()
    plan = _plan(q_json_props_agg(spark, SF))
    # map-side partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_line_dedup_semantics(spark):
    from pdf_ocr_spark.relational.curation import (
        LINE_MIN_DF, LINE_WORDS, q_line_dedup)
    got = q_line_dedup(spark, SF).toPandas().set_index("doc_id")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text", F.md5("text").alias("m"))
            .toPandas().set_index("doc_id"))
    assert len(got) == len(docs)          # every doc survives (maybe empty)
    assert (got.n_removed <= got.n_lines).all()
    assert (got.n_removed > 0).any()      # non-vacuous: boilerplate exists
    # untouched docs rebuild to the byte-identical original text
    untouched = got[got.n_removed == 0]
    assert len(untouched) > 0
    assert (untouched.cleaned_md5 == docs.loc[untouched.index].m).all()
    # scrubbed docs must differ from the original
    touched = got[got.n_removed > 0]
    assert (touched.cleaned_md5 != docs.loc[touched.index].m).all()
    # driver-side recompute of one touched doc pins the chunk semantics
    did = int(touched.index[0])
    words = docs.loc[did].text.split(" ")
    lines = [" ".join(words[i:i + LINE_WORDS])
             for i in range(0, len(words), LINE_WORDS)]
    all_lines = {}
    for t_doc, t_row in docs.iterrows():
        ws = t_row.text.split(" ")
        for ln in {" ".join(ws[i:i + LINE_WORDS])
                   for i in range(0, len(ws), LINE_WORDS)}:
            all_lines.setdefault(ln, set()).add(t_doc)
    kept = [ln for ln in lines if len(all_lines[ln]) < LINE_MIN_DF]
    import hashlib
    want = hashlib.md5(" ".join(kept).encode()).hexdigest()
    assert got.loc[did].cleaned_md5 == want


def test_line_dedup_no_cartesian_no_udf(spark):
    from pdf_ocr_spark.relational.curation import q_line_dedup
    plan = _plan(q_line_dedup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_sample_caps_and_broadcast(spark):
    from pdf_ocr_spark.relational.curation import (
        SAMPLE_TARGET_PER_SOURCE, q_stratified_sample)
    got = q_stratified_sample(spark, SF).toPandas()
    per_src = got.groupby("source").size()
    totals = (spark.read.parquet(f"{SF}/documents.parquet")
              .groupBy("source").count().toPandas()
              .set_index("source")["count"])
    assert len(got) > 0
    for src, n in per_src.items():
        assert n <= totals[src]
        # hash-uniform Bernoulli: within a wide band of the target
        assert n <= 3 * SAMPLE_TARGET_PER_SOURCE
    # sampling actually reduced at least one oversized source
    assert (per_src < totals.loc[per_src.index]).any()
    plan = _plan(q_stratified_sample(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_length_quantiles_monotone(spark):
    from pdf_ocr_spark.relational.curation import q_length_quantiles
    got = q_length_quantiles(spark, SF).toPandas()
    assert len(got) > 0
    assert (got.p10_tokens <= got.p50_tokens).all()
    assert (got.p50_tokens <= got.p90_tokens).all()
    assert (got.n_docs > 0).all()


def _py_window_dup_cover(docs, k, min_occ):
    """Driver-side ExactSubstr recompute: doc_id -> set of covered
    1-based token positions."""
    from collections import Counter
    occ = Counter()
    for _, row in docs.iterrows():
        w = row.text.split(" ")
        for g in range(len(w) - k + 1):
            occ[" ".join(w[g:g + k])] += 1
    cover = {}
    for did, row in docs.iterrows():
        w = row.text.split(" ")
        cov = set()
        for g in range(len(w) - k + 1):
            if occ[" ".join(w[g:g + k])] >= min_occ:
                cov.update(range(g + 1, g + k + 1))
        cover[did] = cov
    return cover


def test_substring_dedup_semantics(spark):
    import hashlib

    from pdf_ocr_spark.relational.curation import (
        SUBSTR_K, SUBSTR_MIN_OCC, q_substring_dedup)
    got = q_substring_dedup(spark, SF).toPandas().set_index("doc_id")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text", F.md5("text").alias("m"))
            .toPandas().set_index("doc_id"))
    # every document appears, including any shorter than K tokens
    assert len(got) == len(docs)
    assert (got.n_dup_tokens <= got.n_tokens).all()
    # non-vacuous both ways: duplicated runs exist, clean docs exist
    touched = got[got.n_dup_tokens > 0]
    untouched = got[got.n_dup_tokens == 0]
    assert len(touched) > 0 and len(untouched) > 0
    # untouched docs rebuild byte-identical; touched must differ
    assert (untouched.cleaned_md5 == docs.loc[untouched.index].m).all()
    assert (touched.cleaned_md5 != docs.loc[touched.index].m).all()
    # full driver-side recompute pins window/coverage/rebuild semantics
    cover = _py_window_dup_cover(docs, SUBSTR_K, SUBSTR_MIN_OCC)
    for did in list(touched.index[:3]) + list(untouched.index[:1]):
        w = docs.loc[did].text.split(" ")
        kept = [tok for i, tok in enumerate(w, 1)
                if i not in cover[did]]
        want = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got.loc[did].cleaned_md5 == want
        assert got.loc[did].n_dup_tokens == len(cover[did])


def test_substring_dedup_plan(spark):
    from pdf_ocr_spark.relational.curation import q_substring_dedup
    plan = _plan(q_substring_dedup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lm_perplexity_semantics(spark):
    import math
    from collections import Counter

    from pdf_ocr_spark.relational.curation import (
        LM_NLL_THRESHOLD, q_lm_perplexity)
    got = q_lm_perplexity(spark, SF).toPandas().set_index("doc_id")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas().set_index("doc_id"))
    assert len(got) == len(docs)
    assert (got.avg_nll > 0).all()
    # the p90-ish threshold splits the corpus non-vacuously
    assert got.high_perplexity.any() and not got.high_perplexity.all()
    assert ((got.avg_nll > LM_NLL_THRESHOLD) == got.high_perplexity).all()
    # driver-side unigram recompute for a flagged and an unflagged doc
    cnt = Counter()
    for text in docs.text:
        cnt.update(text.split(" "))
    total = sum(cnt.values())
    for did in [got[got.high_perplexity].index[0],
                got[~got.high_perplexity].index[0]]:
        toks = docs.loc[did].text.split(" ")
        want = sum(-math.log(cnt[x] / total) for x in toks) / len(toks)
        assert abs(got.loc[did].avg_nll - want) < 1e-6
        assert got.loc[did].n_tok == len(toks)


def test_dsir_weights_semantics(spark):
    import hashlib
    import math
    from collections import Counter

    from pdf_ocr_spark.relational.curation import (
        DSIR_B, DSIR_TARGET_SOURCE, q_dsir_weights)
    got = q_dsir_weights(spark, SF).toPandas().set_index("doc_id")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "text")
            .toPandas().set_index("doc_id"))
    assert len(got) == len(docs)
    assert ((got.avg_logratio > 0.0) == got.in_domain).all()
    # signal direction: target-source docs must score higher on their own
    # feature distribution than the rest of the corpus does
    tgt = docs.index[docs.source == DSIR_TARGET_SOURCE]
    oth = docs.index[docs.source != DSIR_TARGET_SOURCE]
    assert got.loc[tgt].avg_logratio.mean() > \
        got.loc[oth].avg_logratio.mean()
    assert got.loc[tgt].in_domain.mean() > got.loc[oth].in_domain.mean()

    # full driver-side recompute pins the feature hashing, smoothing and
    # the mean-log-ratio estimator
    def feats(text):
        w = text.split(" ")
        grams = list(w)
        if len(w) >= 2:
            grams += [f"{a} {b}" for a, b in zip(w, w[1:])]
        return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DSIR_B
                for g in grams]

    cr, ct = Counter(), Counter()
    for did, row in docs.iterrows():
        fs = feats(row.text)
        cr.update(fs)
        if row.source == DSIR_TARGET_SOURCE:
            ct.update(fs)
    tot_r, tot_t = sum(cr.values()), sum(ct.values())
    for did in [tgt[0], oth[0], oth[1]]:
        fs = feats(docs.loc[did].text)
        want = sum(
            math.log((ct[f] + 1.0) / (tot_t + DSIR_B))
            - math.log((cr[f] + 1.0) / (tot_r + DSIR_B)) for f in fs
        ) / len(fs)
        assert abs(got.loc[did].avg_logratio - want) < 1e-6
        assert got.loc[did].n_feats == len(fs)


def test_dsir_weights_plan(spark):
    from pdf_ocr_spark.relational.curation import q_dsir_weights
    plan = _plan(q_dsir_weights(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_substring_dedup_short_doc_passthrough(spark, tmp_path):
    """Docs shorter than SUBSTR_K tokens contain no K-window by
    definition: they must appear in the output unchanged (the sf
    corpora contain none, so this pins it on a synthetic table)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.relational.curation import (
        SUBSTR_K, q_substring_dedup)
    dup_run = " ".join(f"w{i}" for i in range(SUBSTR_K))
    texts = ["tiny doc", f"{dup_run} alpha beta", f"{dup_run} gamma delta"]
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = (q_substring_dedup(spark, str(tmp_path))
           .toPandas().set_index("doc_id"))
    assert len(got) == 3
    short = got.loc[0]
    assert short.n_tokens == 2 and short.n_dup_tokens == 0
    assert short.cleaned_md5 == hashlib.md5(b"tiny doc").hexdigest()
    # the shared K-run is cut from both long docs
    for did, tail in [(1, "alpha beta"), (2, "gamma delta")]:
        assert got.loc[did].n_dup_tokens == SUBSTR_K
        assert got.loc[did].cleaned_md5 == \
            hashlib.md5(tail.encode()).hexdigest()


def test_lm_perplexity_bigram_semantics(spark):
    import math
    from collections import Counter

    from pdf_ocr_spark.relational.curation import (
        LM_BIGRAM_LAMBDA, LM_BIGRAM_NLL_THRESHOLD, q_lm_perplexity_bigram)
    got = q_lm_perplexity_bigram(spark, SF).toPandas().set_index("doc_id")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas().set_index("doc_id"))
    assert len(got) == len(docs)
    assert (got.avg_nll > 0).all()
    assert ((got.avg_nll > LM_BIGRAM_NLL_THRESHOLD)
            == got.high_perplexity).all()
    # driver-side recompute: interpolated bigram/unigram NLL
    uni, big, ctx = Counter(), Counter(), Counter()
    total = 0
    for text in docs.text:
        w = text.split(" ")
        uni.update(w)
        total += len(w)
        big.update(zip(w, w[1:]))
        ctx.update(w[:-1])
    for did in list(docs.index)[:3]:
        w = docs.loc[did].text.split(" ")
        nll = -math.log(uni[w[0]] / total)
        for a, b in zip(w, w[1:]):
            p = (LM_BIGRAM_LAMBDA * big[(a, b)] / ctx[a]
                 + (1 - LM_BIGRAM_LAMBDA) * uni[b] / total)
            nll += -math.log(p)
        want = nll / len(w)
        assert abs(got.loc[did].avg_nll - want) < 1e-6
        assert got.loc[did].n_tok == len(w)


def test_lm_perplexity_bigram_plan(spark):
    """Positions stay in-row (no lag window, no position self-join);
    no cartesian, no Python UDF."""
    from pdf_ocr_spark.relational.curation import q_lm_perplexity_bigram
    plan = _plan(q_lm_perplexity_bigram(spark, SF))
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan  # no lag window: positions in-row
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_classifier_learns_planted_vocabulary(spark):
    """The in-query NB classifier recovers the planted language-marker
    vocabulary: resubstitution accuracy >= 0.9 (the synthetic corpus
    itself carries NO language-correlated vocabulary — without the
    plant, no classifier beats the 0.56 majority baseline, measured)."""
    from pdf_ocr_spark.relational.curation import q_quality_classifier

    got = q_quality_classifier(spark, SF).toPandas()
    assert len(got) > 0
    acc = got["correct"].mean()
    assert acc >= 0.9
    # scores are real log-odds, not a constant: both classes predicted
    assert got["pred_en"].nunique() == 2
