"""Corpus-curation operators for training-data pipelines (documents/events).

Four first-class curation ops a 100-TB pretraining pipeline runs between
extraction and packing:

- ``repetition_stats``  — Gopher-style within-document repetition metrics
  (duplicate n-gram fractions; Rae et al. 2021 "Scaling Language Models",
  Table A1 repetition filters). Pure map-side expressions: zero shuffles,
  scales linearly with the scan.
- ``contamination_check`` — benchmark-contamination scan: which training
  docs share word 5-grams with a held-out eval split. The eval side is a
  fixed-size gram set at any corpus scale, so the join is a broadcast —
  the 100-TB shape is one scan + one map-side join + one aggregation.
- ``pii_redact``        — email/phone scrubbing with exact counts. The
  driver tables carry no PII, so the query PLANTS deterministic spans
  (same expression in both engines) and proves the scrubber removes
  exactly those — non-vacuous by construction.
- ``json_props_agg``    — semi-structured extraction: parse the events
  table's JSON ``props`` column and aggregate per event type (the
  reference parses JSON task metadata the same way,
  SmartPDF-OCR app/api/tasks.py history payloads).

All queries are built-in-function only (no Python UDFs) with DuckDB oracle
twins; column names match exactly for the driver's hash gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .util import round6, sql_round6, hash60, hash60_sql, salted_mod, t

# Gopher's production thresholds (0.20 duplicate-2-gram / 0.18 3-gram char
# fractions) are tuned for web text; this synthetic corpus is a small-vocab
# word soup, so the flag thresholds are scaled to split it meaningfully
# (measured at sf0.01: d2 median 0.028 / max 0.133, d3 nonzero in 5%).
REP_2GRAM_THRESHOLD = 0.05
REP_3GRAM_THRESHOLD = 0.02


def _dup_frac_expr(n: int) -> str:
    """1 - distinct/total word n-grams, as a Spark SQL expression over w."""
    parts = ", ".join(f"element_at(w, g + {i})" for i in range(n))
    grams = (f"transform(sequence(1, size(w) - {n - 1}), "
             f"g -> concat_ws(' ', {parts}))")
    return (f"1.0 - cast(size(array_distinct({grams})) as double) "
            f"/ cast(size(w) - {n - 1} as double)")


def _dup_frac_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"w[g + {i}]" for i in range(n))
    grams = f"list_transform(range(1, len(w) - {n - 2}), g -> {parts})"
    return (f"1.0 - len(list_distinct({grams}))::DOUBLE "
            f"/ (len(w) - {n - 1})::DOUBLE")


def q_repetition_stats(spark, sf_dir):
    """Within-document repetition metrics: duplicate word 2-gram and 3-gram
    fractions plus a repetitive flag (Gopher repetition-filter family).

    Scale shape: a single projection over the scan — no explode, no
    shuffle; the n-gram arrays live only inside one row's expression."""
    d = t(spark, sf_dir, "documents")
    base = (d.select("doc_id", F.split("text", " ").alias("w"))
            .filter(F.size("w") >= 6))
    d2 = F.expr(_dup_frac_expr(2))
    d3 = F.expr(_dup_frac_expr(3))
    return (base.select(
        "doc_id",
        round6(d2).alias("dup_2gram_frac"),
        round6(d3).alias("dup_3gram_frac"),
        ((d2 > REP_2GRAM_THRESHOLD) | (d3 > REP_3GRAM_THRESHOLD))
        .alias("repetitive"))
        .orderBy("doc_id"))


SQL_REPETITION_STATS = f"""
WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 6
), m AS (
  SELECT doc_id, {_dup_frac_sql(2)} AS d2, {_dup_frac_sql(3)} AS d3 FROM b
)
SELECT doc_id,
       {sql_round6('d2')} AS dup_2gram_frac,
       {sql_round6('d3')} AS dup_3gram_frac,
       (d2 > {REP_2GRAM_THRESHOLD} OR d3 > {REP_3GRAM_THRESHOLD})
         AS repetitive
FROM m ORDER BY doc_id
"""


CONTAM_EVAL_PCT = 20  # eval split share; split buckets shared with
#                       q_split_assign ("split:" md5 salt, stable)
_GRAM5_EXPR = (
    "transform(sequence(1, size(w) - 4), g -> concat_ws(' ', "
    "element_at(w, g), element_at(w, g + 1), element_at(w, g + 2), "
    "element_at(w, g + 3), element_at(w, g + 4)))"
)
_GRAM5_SQL = (
    "list_transform(range(1, greatest(len(w) - 3, 1)), "
    "g -> w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] "
    "|| ' ' || w[g+4])"
)


def q_contamination_check(spark, sf_dir, eval_grams=None):
    """Benchmark-contamination scan: training docs (split bucket <
    100-CONTAM_EVAL_PCT, same deterministic md5 buckets as split_assign)
    that share a word 5-gram with any eval-split doc, with contaminated
    gram counts and fraction.

    Scale shape: the ``F.broadcast`` hint encodes the PRODUCTION
    contract — the eval side is a fixed benchmark suite's gram hashes
    (a few MB at any corpus scale), passed in via ``eval_grams`` (an
    (h,) frame of 60-bit gram hashes) — and is applied ONLY in that
    caller-supplied case. The default derives a pseudo-eval set from
    the corpus's own CONTAM_EVAL_PCT split buckets so the op is
    self-contained at gate scale; that derived side is a corpus
    FRACTION, so it gets no hint and AQE sizes the join at runtime
    (ADVICE r4). The training side is one distinct-shuffle plus one
    aggregation; grams compare by the portable 60-bit md5 hash
    (identical in the oracle), so a broadcast ships longs, not
    strings."""
    d = t(spark, sf_dir, "documents")
    bucket = salted_mod("doc_id", "split:", 100)
    grams = (d.select("doc_id", bucket.alias("b"),
                      F.split("text", " ").alias("w"))
             .filter(F.size("w") >= 5)
             .select("doc_id", "b",
                     F.explode(F.expr(_GRAM5_EXPR)).alias("s"))
             .select("doc_id", "b", hash60("s").alias("h"))
             .distinct())
    # the broadcast hint is the FIXED-SIZE benchmark contract: apply it
    # only when the caller supplied the eval set. The self-derived
    # default is a fraction of the corpus itself — broadcasting it would
    # OOM the executors at the 100-TB shape, so there the optimizer
    # (AQE) picks the join strategy from observed sizes (ADVICE r4)
    fixed_size_eval = eval_grams is not None
    if eval_grams is None:
        eval_grams = grams.filter(F.col("b") >= 100 - CONTAM_EVAL_PCT)
    # distinct UNCONDITIONALLY: a caller-supplied benchmark union can
    # repeat a gram hash, and a duplicated hash would fan out the left
    # join — double-counting n_contaminated AND inflating n_grams past
    # the doc's distinct gram count (frac > 1.0)
    eval_h = eval_grams.select("h").distinct().withColumn("hit", F.lit(1))
    if fixed_size_eval:
        eval_h = F.broadcast(eval_h)
    train = grams.filter(F.col("b") < 100 - CONTAM_EVAL_PCT)
    scored = (train.join(eval_h, "h", "left")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_grams"),
                   F.sum(F.coalesce("hit", F.lit(0)))
                   .alias("n_contaminated")))
    return (scored.filter(F.col("n_contaminated") > 0)
            .select("doc_id", "n_contaminated", "n_grams",
                    round6(F.col("n_contaminated") / F.col("n_grams"))
                    .alias("contaminated_frac"))
            .orderBy("doc_id"))


SQL_CONTAMINATION_CHECK = f"""
WITH s AS (
  SELECT doc_id,
         ({hash60_sql("'split:' || doc_id::VARCHAR")} % 100) AS b
  FROM documents
),
grams AS (
  SELECT DISTINCT d.doc_id, s.b, {hash60_sql('g.s5')} AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d
  JOIN s ON s.doc_id = d.doc_id,
  LATERAL (SELECT unnest({_GRAM5_SQL}) AS s5) g
  WHERE len(d.w) >= 5
),
eval_h AS (
  SELECT DISTINCT h FROM grams WHERE b >= {100 - CONTAM_EVAL_PCT}
),
scored AS (
  SELECT doc_id, count(*) AS n_grams,
         count(*) FILTER (WHERE h IN (SELECT h FROM eval_h))
           AS n_contaminated
  FROM grams WHERE b < {100 - CONTAM_EVAL_PCT} GROUP BY doc_id
)
SELECT doc_id, n_contaminated, n_grams,
       {sql_round6('n_contaminated::DOUBLE / n_grams')}
         AS contaminated_frac
FROM scored WHERE n_contaminated > 0 ORDER BY doc_id
"""


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
# bounded-octet IPv4: rejects 999.1.1.1 without matching a suffix of it
IP_RE = (r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
         r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b")
# payment-card SHAPE: 13-19 digits with optional single space/dash
# separators. Redaction is shape-based (conservative scrubbing: a
# mistyped card number is still worth removing); the n_ccs COUNT is
# Luhn-validated so monitoring reflects real card exposure.
CC_RE = r"\b\d(?:[ -]?\d){12,18}\b"
# API-key-shaped tokens: common prefix + >=16 token chars
KEY_RE = r"\b(?:sk|pk|api|key)_[A-Za-z0-9]{16,}\b"

# known-good/bad Luhn test numbers planted by the gate fixture (public
# test-card numbers; one space-separated to exercise separator handling)
_CC_VALID = ("4111111111111111", "5500 0055 5555 5559")
_CC_INVALID = "4111-1111-1111-1112"


def _luhn_count_expr(col: str, cc_sql: str) -> str:
    """Spark SQL expression: count of Luhn-VALID card-shaped candidates
    in ``col``. Digits d (left->right): weight by (len-1-i) % 2 — the
    rightmost digit (check digit) is added as-is, every second digit
    moving left is doubled (minus 9 when > 9); valid iff sum % 10 == 0.
    Same formulation as the DuckDB twin (range/(len(d)-i) there,
    0-based transform index here). Nested higher-order functions stay
    inside whole-stage codegen — no UDF."""
    digits = f"filter(split(s, ''), c2 -> c2 rlike '[0-9]')"
    return f"""
size(filter(regexp_extract_all({col}, '{cc_sql}', 0),
  s -> (aggregate(
          transform({digits},
            (c, i) -> CASE WHEN (size({digits}) - 1 - i) % 2 = 0
                      THEN int(c)
                      ELSE IF(int(c)*2 > 9, int(c)*2 - 9, int(c)*2) END),
          0, (a, x) -> a + x) % 10) = 0))
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub with exact counts: plant deterministic email / phone /
    IPv4 / credit-card / API-key spans (every 7th / 11th / 5th / 13th /
    19th doc_id; every 17th gets a Luhn-INVALID card — the driver tables
    carry no organic PII), then redact with the production regexes and
    return per-doc counts plus the md5 of the scrubbed text.

    Counts: n_ccs counts only Luhn-VALID card candidates (nested
    higher-order-function checksum, no UDF); redaction of card-shaped
    spans is conservative (shape-based) so the invalid plant is scrubbed
    but not counted.

    Scale shape: pure map-side regex + array work in whole-stage
    codegen — no shuffle, no UDF; the md5 column is what a real pipeline
    would write back for audit lineage."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("long")
    planted = F.concat(
        F.col("text"),
        F.when(did % 7 == 0,
               F.concat(F.lit(" contact user"), did.cast("string"),
                        F.lit("@example.com")))
        .otherwise(F.lit("")),
        F.when(did % 11 == 0,
               F.concat(F.lit(" call "),
                        F.lpad((did % 900 + 100).cast("string"), 3, "0"),
                        F.lit("-555-"),
                        F.lpad((did % 10000).cast("string"), 4, "0")))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0,
               F.concat(F.lit(" src 10."), (did % 200).cast("string"),
                        F.lit("."), (did % 250).cast("string"),
                        F.lit("."), (did % 100).cast("string")))
        .otherwise(F.lit("")),
        F.when(did % 13 == 0,
               F.concat(F.lit(" pay "),
                        F.when(did % 2 == 0, F.lit(_CC_VALID[0]))
                        .otherwise(F.lit(_CC_VALID[1])),
                        F.lit(" ok")))
        .otherwise(F.lit("")),
        F.when(did % 17 == 0,
               F.concat(F.lit(" ref "), F.lit(_CC_INVALID), F.lit(" end")))
        .otherwise(F.lit("")),
        F.when(did % 19 == 0,
               F.concat(F.lit(" token sk_"),
                        F.substring(F.md5(did.cast("string")), 1, 20)))
        .otherwise(F.lit("")))
    # Spark SQL string literals eat one level of backslashes
    email_sql = EMAIL_RE.replace("\\", "\\\\")
    phone_sql = PHONE_RE.replace("\\", "\\\\")
    ip_sql = IP_RE.replace("\\", "\\\\")
    cc_sql = CC_RE.replace("\\", "\\\\")
    key_sql = KEY_RE.replace("\\", "\\\\")
    base = d.select("doc_id", planted.alias("ptext"))

    def _n(pat_sql):
        return F.expr(f"size(regexp_extract_all(ptext, '{pat_sql}', 0))")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("ptext", EMAIL_RE, "<EMAIL>"),
                    PHONE_RE, "<PHONE>"),
                IP_RE, "<IP>"),
            CC_RE, "<CC>"),
        KEY_RE, "<KEY>")
    return (base.select(
        "doc_id",
        _n(email_sql).alias("n_emails"),
        _n(phone_sql).alias("n_phones"),
        _n(ip_sql).alias("n_ips"),
        F.expr(_luhn_count_expr("ptext", cc_sql)).alias("n_ccs"),
        _n(key_sql).alias("n_keys"),
        F.md5(redacted).alias("redacted_md5"))
        .orderBy("doc_id"))


# DuckDB Luhn twin: 1-based list index i, weight by (len(d)-i) % 2 —
# same rightmost-anchored parity as the Spark expression
_SQL_LUHN_DIGITS = "list_transform(regexp_extract_all(s, '[0-9]'), x -> x::INT)"
_SQL_LUHN_COUNT = f"""
len(list_filter(regexp_extract_all(ptext, '{CC_RE}'),
  s -> (list_sum(list_transform(range(1, len({_SQL_LUHN_DIGITS})+1),
        i -> CASE WHEN (len({_SQL_LUHN_DIGITS})-i) % 2 = 0
                  THEN {_SQL_LUHN_DIGITS}[i]
                  ELSE CASE WHEN {_SQL_LUHN_DIGITS}[i]*2 > 9
                            THEN {_SQL_LUHN_DIGITS}[i]*2-9
                            ELSE {_SQL_LUHN_DIGITS}[i]*2 END END)) % 10 = 0)))
"""

SQL_PII_REDACT = f"""
WITH p AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call ' || lpad((doc_id % 900 + 100)::VARCHAR, 3, '0')
                      || '-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' src 10.' || (doc_id % 200)::VARCHAR
                      || '.' || (doc_id % 250)::VARCHAR
                      || '.' || (doc_id % 100)::VARCHAR
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' pay ' || CASE WHEN doc_id % 2 = 0
                                      THEN '{_CC_VALID[0]}'
                                      ELSE '{_CC_VALID[1]}' END || ' ok'
                 ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN ' ref {_CC_INVALID} end'
                 ELSE '' END
         || CASE WHEN doc_id % 19 = 0
                 THEN ' token sk_' || substr(md5(doc_id::VARCHAR), 1, 20)
                 ELSE '' END AS ptext
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(ptext, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(ptext, '{PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(ptext, '{IP_RE}')) AS n_ips,
       {_SQL_LUHN_COUNT} AS n_ccs,
       len(regexp_extract_all(ptext, '{KEY_RE}')) AS n_keys,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(ptext, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
             '{IP_RE}', '<IP>', 'g'),
             '{CC_RE}', '<CC>', 'g'),
             '{KEY_RE}', '<KEY>', 'g')) AS redacted_md5
FROM p ORDER BY doc_id
"""


def q_json_props_agg(spark, sf_dir):
    """Semi-structured extraction: parse the events table's JSON props
    column (``{"k": <int>}``) and aggregate per event type.

    Scale shape: get_json_object runs JVM-side inside codegen; one
    map-side-combinable aggregation."""
    d = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (d.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(k).cast("long").alias("sum_k"),
                 round6(F.avg(k)).alias("avg_k"))
            .orderBy("event_type"))


SQL_JSON_PROPS_AGG = f"""
SELECT event_type, count(*) AS n_events,
       sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
       {sql_round6("avg(json_extract_string(props, '$.k')::INT)")} AS avg_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_domain_mix(spark, sf_dir):
    """Domain-mixture weighting: per-source token counts, the source's
    natural share of the corpus, and the sampling weight that rebalances
    training to a uniform target mixture (weight = target/natural, the
    standard importance-sampling correction; DoReMi-style pipelines swap
    in a learned target vector, same plumbing).

    Scale shape: the corpus collapses to one row per source FIRST
    (map-side-combinable agg); the share/weight window runs over that
    already-aggregated, sources-sized frame — a deliberate global window
    over n_sources rows, never over the corpus."""
    from pyspark.sql.window import Window
    d = t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    per_src = (d.groupBy("source")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(toks).cast("long").alias("n_tokens")))
    w = Window.partitionBy(F.lit(1))
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    n_src = F.count("*").over(w)
    return (per_src
            .select("source", "n_docs", "n_tokens",
                    round6(share).alias("natural_share"),
                    round6((1.0 / n_src) / share).alias("mix_weight"))
            .orderBy("source"))


SQL_DOMAIN_MIX = rf"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(len(regexp_split_to_array(trim(text), '\s+')))::BIGINT
           AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       {sql_round6('n_tokens / (sum(n_tokens) OVER ())::DOUBLE')}
         AS natural_share,
       {sql_round6('(1.0 / (count(*) OVER ())) '
                   '/ (n_tokens / (sum(n_tokens) OVER ())::DOUBLE)')}
         AS mix_weight
FROM per_src ORDER BY source
"""


LINE_WORDS = 10   # deterministic chunking: the corpus is single-line
#                   word soup, so "lines" are fixed 10-word chunks —
#                   identical expressions in both engines
LINE_MIN_DF = 3   # remove a line seen in >= 3 distinct docs (the same
#                   >=3-repeat gate as the header/footer op, L4)


def q_line_dedup(spark, sf_dir):
    """Corpus-level line deduplication (CCNet / RefinedWeb boilerplate
    removal): chunk each document into deterministic 10-word lines,
    count each line's corpus-wide document frequency, drop lines seen in
    >= LINE_MIN_DF distinct documents, and rebuild the document from the
    surviving lines in order. Returns per-doc line counts plus the md5
    of the cleaned text (what a real pipeline writes back).

    Scale shape: posexplode -> distinct (line,doc) -> map-side-combinable
    df count; lines travel as the portable 60-bit hash, not strings, into
    the removal join (NOT broadcast by construction — at 100 TB the
    boilerplate set is corpus-sized-ish, so it stays a shuffled hash
    join on the already-partitioned hash key; AQE will broadcast it when
    it is in fact small); ordered rebuild is one groupBy with an
    array_sort on (pos, line) — no global window, no Python UDF."""
    d = t(spark, sf_dir, "documents")
    lines_expr = (
        f"transform(sequence(0, cast(ceil(size(w) / {LINE_WORDS}.0) as int)"
        f" - 1), g -> concat_ws(' ', slice(w, g * {LINE_WORDS} + 1, "
        f"{LINE_WORDS})))")
    lines = (d.select("doc_id", F.split("text", " ").alias("w"))
             .select("doc_id",
                     F.posexplode(F.expr(lines_expr)).alias("pos", "line"))
             .withColumn("h", hash60("line")))
    rem = (lines.select("h", "doc_id").distinct()
           .groupBy("h").agg(F.count("*").alias("df"))
           .filter(F.col("df") >= LINE_MIN_DF)
           .select("h", F.lit(1).alias("rm")))
    scored = lines.join(rem, "h", "left")
    cleaned = F.expr(
        "concat_ws(' ', transform(array_sort(collect_list("
        "case when rm is null then struct(pos, line) end)), x -> x.line))")
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.when(F.col("rm") == 1, 1).otherwise(0))
                 .cast("long").alias("n_removed"),
                 F.md5(cleaned).alias("cleaned_md5"))
            .orderBy("doc_id"))


SQL_LINE_DEDUP = f"""
WITH L AS (
  SELECT doc_id, g AS pos,
         array_to_string(
           w[(g * {LINE_WORDS} + 1):(g * {LINE_WORDS} + {LINE_WORDS})],
           ' ') AS line
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
       LATERAL (SELECT unnest(range(0,
                  cast(ceil(len(w) / {LINE_WORDS}.0) AS INT))) AS g)
),
H AS (SELECT doc_id, pos, line, {hash60_sql('line')} AS h FROM L),
R AS (
  SELECT h FROM (SELECT DISTINCT h, doc_id FROM H)
  GROUP BY h HAVING count(*) >= {LINE_MIN_DF}
)
SELECT doc_id, count(*) AS n_lines,
       count(*) FILTER (WHERE h IN (SELECT h FROM R)) AS n_removed,
       md5(coalesce(string_agg(line, ' ' ORDER BY pos)
                    FILTER (WHERE h NOT IN (SELECT h FROM R)), ''))
         AS cleaned_md5
FROM H GROUP BY doc_id ORDER BY doc_id
"""


SAMPLE_TARGET_PER_SOURCE = 10  # downsample every domain to ~this many
#                                docs (driver tables hold 25 docs/source,
#                                so 10 makes the cap non-vacuous)


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified (per-domain) downsampling: cap every
    source at ~SAMPLE_TARGET_PER_SOURCE docs by keeping doc_ids whose
    salted md5 bucket (of 10,000) falls under floor(target*10000 /
    n_source_docs) — reproducible across runs and engines, no RNG.

    Scale shape: the per-source count table has one row per domain
    (broadcast by construction); the filter itself is map-side, so the
    whole op is one small agg + one broadcast join + a scan."""
    d = t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count("*").alias("n_src"))
    thresh = F.least(
        F.lit(10000),
        F.floor(F.lit(SAMPLE_TARGET_PER_SOURCE * 10000) / F.col("n_src")))
    return (d.join(F.broadcast(per), "source")
            .filter(salted_mod("doc_id", "sample:", 10000) < thresh)
            .select("doc_id", "source")
            .orderBy("doc_id"))


SQL_STRATIFIED_SAMPLE = f"""
WITH per AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source)
SELECT doc_id, d.source
FROM documents d JOIN per USING (source)
WHERE ({hash60_sql("'sample:' || doc_id::VARCHAR")} % 10000)
      < least(10000, {SAMPLE_TARGET_PER_SOURCE * 10000} // n_src)
ORDER BY doc_id
"""


def q_length_quantiles(spark, sf_dir):
    """Per-source token-length distribution (exact p10/p50/p90): the
    numbers a curation pipeline reads to set its length-filter
    thresholds per domain. Spark's exact ``percentile`` and DuckDB's
    ``quantile_cont`` both interpolate linearly at rank (n-1)*p, so the
    twins agree bit-for-bit after round6.

    Scale shape: exact percentile is a per-group sort — fine while every
    (source) group fits an executor (true for per-domain grouping); at
    finer granularity swap in approx_percentile, same plumbing."""
    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim("text"), r"\s+"))
    base = d.select("source", ntok.alias("n_tok"))
    return (base.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 round6(F.expr("percentile(n_tok, 0.1)"))
                 .alias("p10_tokens"),
                 round6(F.expr("percentile(n_tok, 0.5)"))
                 .alias("p50_tokens"),
                 round6(F.expr("percentile(n_tok, 0.9)"))
                 .alias("p90_tokens"))
            .orderBy("source"))


SQL_LENGTH_QUANTILES = rf"""
WITH b AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
  FROM documents
)
SELECT source, count(*) AS n_docs,
       {sql_round6('quantile_cont(n_tok, 0.1)')} AS p10_tokens,
       {sql_round6('quantile_cont(n_tok, 0.5)')} AS p50_tokens,
       {sql_round6('quantile_cont(n_tok, 0.9)')} AS p90_tokens
FROM b GROUP BY source ORDER BY source
"""


SUBSTR_K = 8       # duplicated-run length in tokens. Lee et al. 2021
#                    ("Deduplicating Training Data Makes Language Models
#                    Better") use 50 BPE tokens on web text; the driver's
#                    synthetic docs are 10-99 words, so 8 keeps the op
#                    non-vacuous (measured sf0.01: 2,101 duplicated windows
#                    across 47 of 500 docs — near-dup docs share long runs)
SUBSTR_MIN_OCC = 2  # a window is "duplicated" at >= 2 total occurrences
#                    (ExactSubstr counts occurrences, not distinct docs:
#                    within-doc repeats are cut too)


def q_substring_dedup(spark, sf_dir):
    """Exact-substring deduplication (ExactSubstr, Lee et al. 2021): any
    run of SUBSTR_K tokens that occurs >= SUBSTR_MIN_OCC times corpus-wide
    is removed from every document; overlapping duplicated windows merge
    into spans (union of covered token positions). Returns per-doc token /
    duplicated-token counts plus the md5 of the cleaned text — one row
    per document, including docs shorter than SUBSTR_K tokens (they
    contain no K-window by definition and pass through unchanged).

    The reference paper builds a suffix array; the Spark-native shape is a
    sliding-window hash join — same semantics at fixed K.

    Scale shape: windows travel as the portable 60-bit hash into a
    map-side-combinable occurrence count; the dup-set join keys on that
    hash (NOT broadcast by construction — duplicated-window sets are
    corpus-sized on real web text, AQE broadcasts when small); the
    position union and token rebuild are in-row array expressions inside
    one groupBy — no global window, no Python UDF, no cartesian."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w"))
    # windows only exist for docs with >= K tokens; shorter docs carry no
    # duplicated window BY DEFINITION and pass through unchanged below
    eligible = base.filter(F.size("w") >= SUBSTR_K)
    wins_expr = (
        f"transform(sequence(1, size(w) - {SUBSTR_K - 1}), "
        f"g -> concat_ws(' ', slice(w, g, {SUBSTR_K})))")
    wins = (eligible.select(
        "doc_id", F.posexplode(F.expr(wins_expr)).alias("p0", "gram"))
        .select("doc_id", (F.col("p0") + 1).alias("g"),
                hash60("gram").alias("h")))
    dup = (wins.groupBy("h").agg(F.count("*").alias("occ"))
           .filter(F.col("occ") >= SUBSTR_MIN_OCC).select("h"))
    marked = (wins.join(dup, "h")
              .groupBy("doc_id").agg(F.collect_list("g").alias("gs")))
    cov = F.expr(
        f"array_distinct(flatten(transform("
        f"coalesce(gs, cast(array() as array<int>)), "
        f"g -> sequence(g, g + {SUBSTR_K - 1}))))")
    cleaned = F.expr(
        "concat_ws(' ', filter(w, (x, i) -> "
        "NOT array_contains(cov, i + 1)))")
    return (base.join(marked, "doc_id", "left")
            .select("doc_id", F.size("w").alias("n_tokens"),
                    cov.alias("cov"), "w")
            .select("doc_id", "n_tokens",
                    F.size("cov").alias("n_dup_tokens"),
                    F.md5(cleaned).alias("cleaned_md5"))
            .orderBy("doc_id"))


SQL_SUBSTRING_DEDUP = f"""
WITH B AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
W AS (
  SELECT doc_id, g,
         {hash60_sql(f"array_to_string(w[g:g+{SUBSTR_K - 1}], ' ')")} AS h
  FROM B, LATERAL (SELECT unnest(range(1, len(w) - {SUBSTR_K - 2})) AS g)
  WHERE len(w) >= {SUBSTR_K}
),
D AS (SELECT h FROM W GROUP BY h HAVING count(*) >= {SUBSTR_MIN_OCC}),
C AS (
  SELECT DISTINCT doc_id, p
  FROM W, LATERAL (SELECT unnest(range(g, g + {SUBSTR_K})) AS p)
  WHERE h IN (SELECT h FROM D)
),
T AS (
  SELECT doc_id, p, w[p] AS tok
  FROM B, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS p)
),
CL AS (
  SELECT t.doc_id,
         count(*) FILTER (WHERE c.p IS NOT NULL) AS n_dup_tokens,
         coalesce(string_agg(t.tok, ' ' ORDER BY t.p)
                  FILTER (WHERE c.p IS NULL), '') AS clean
  FROM T t LEFT JOIN C c ON c.doc_id = t.doc_id AND c.p = t.p
  GROUP BY t.doc_id
)
SELECT b.doc_id, len(b.w) AS n_tokens, cl.n_dup_tokens,
       md5(cl.clean) AS cleaned_md5
FROM B b JOIN CL cl ON cl.doc_id = b.doc_id
ORDER BY b.doc_id
"""


LM_NLL_THRESHOLD = 3.41  # ~p90 of the synthetic corpus (measured sf0.01:
#                          median 3.4015, p90 3.4099, max 3.6992) — flags
#                          the unusual-token-mix tail, the CCNet use


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality filter (Wenzek et al. 2020): train a unigram
    LM over the corpus (MLE token probabilities), score every document by
    its mean negative log-likelihood per token (log-perplexity), and flag
    the high-perplexity tail. CCNet scores with a pretrained KenLM 5-gram;
    the self-trained unigram is the same plumbing with a deterministic,
    dependency-free model — swap the probability table to change models.

    Scale shape: the LM "training" is one map-side-combinable token count;
    the total-count normalizer is a one-row scalar aggregate broadcast
    onto the vocab frame (a single-partition window here would funnel an
    unbounded vocab through one task at 100 TB); scoring is a hash join
    on token (AQE broadcasts the vocab when small — unbounded vocab stays
    a shuffled join on the already-partitioned key) + one aggregation."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    total = toks.agg(F.count("*").alias("tot"))
    probs = (toks.groupBy("tok").agg(F.count("*").alias("cnt"))
             .crossJoin(F.broadcast(total))
             .select("tok", (F.col("cnt") / F.col("tot")).alias("p")))
    return (toks.join(probs, "tok")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tok"),
                 round6(F.avg(-F.log("p"))).alias("avg_nll"))
            .select("doc_id", "n_tok", "avg_nll",
                    (F.col("avg_nll") > LM_NLL_THRESHOLD)
                    .alias("high_perplexity"))
            .orderBy("doc_id"))


SQL_LM_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
probs AS (
  SELECT tok, cnt / (sum(cnt) OVER ())::DOUBLE AS p
  FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
),
s AS (
  SELECT doc_id, count(*) AS n_tok,
         {sql_round6('avg(-ln(p))')} AS avg_nll
  FROM toks JOIN probs USING (tok) GROUP BY doc_id
)
SELECT doc_id, n_tok, avg_nll,
       (avg_nll > {LM_NLL_THRESHOLD}) AS high_perplexity
FROM s ORDER BY doc_id
"""


DSIR_B = 1024        # hashed feature buckets. Xie et al. 2023 ("Data
#                      Selection for Language Models via Importance
#                      Resampling") use 10k buckets over unigrams+bigrams;
#                      1024 matches this corpus's vocab scale — same op
DSIR_TARGET_SOURCE = "src0"  # in-domain proxy: one source plays the
#                      target corpus. Production passes a real target
#                      sample; the estimator below is source-agnostic


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): score every document by
    how much more likely its hashed unigram+bigram features are under the
    target-domain LM than under the raw-corpus LM — the log importance
    ratio, length-normalized (mean over the doc's feature occurrences),
    with add-one smoothing over the DSIR_B hashed buckets. Docs with
    positive mean log-ratio look target-like (``in_domain``); production
    resamples with these weights, which is `stratified_sample` plumbing.

    Scale shape: feature counts are one map-side-combinable aggregation
    over the gram explode (the target side is a FILTER of the same scan,
    counted in the same agg — one pass, not two); the log-ratio table is
    at most DSIR_B rows, so the scoring join broadcasts; the per-doc
    score is one more combinable aggregation. No UDF, no cartesian."""
    from pyspark.sql.window import Window
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", F.split("text", " ").alias("w"))
    # unigrams + bigrams, guarded so 1-token docs never hit Spark's
    # descending sequence(1, 0) == [1, 0]
    grams_expr = (
        "CASE WHEN size(w) < 2 THEN w ELSE concat(w, "
        "transform(sequence(1, size(w) - 1), "
        "g -> concat_ws(' ', element_at(w, g), element_at(w, g + 1)))) "
        "END")
    feats = (base.select("doc_id", "source",
                         F.explode(F.expr(grams_expr)).alias("gram"))
             .select("doc_id", "source",
                     F.pmod(hash60("gram"), F.lit(DSIR_B)).alias("f")))
    cnts = (feats.groupBy("f")
            .agg(F.count("*").alias("cr"),
                 F.count(F.when(F.col("source") == DSIR_TARGET_SOURCE,
                                True)).alias("ct")))
    w = Window.partitionBy(F.lit(1))
    ratio = cnts.select(
        "f",
        (F.log((F.col("ct") + 1.0)
               / (F.sum("ct").over(w) + float(DSIR_B)))
         - F.log((F.col("cr") + 1.0)
                 / (F.sum("cr").over(w) + float(DSIR_B)))).alias("lr"))
    return (feats.join(ratio, "f")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_feats"),
                 round6(F.avg("lr")).alias("avg_logratio"))
            .select("doc_id", "n_feats", "avg_logratio",
                    (F.col("avg_logratio") > 0.0).alias("in_domain"))
            .orderBy("doc_id"))


SQL_DSIR_WEIGHTS = f"""
WITH B AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
G AS (
  SELECT doc_id, source, gram
  FROM B, LATERAL (SELECT unnest(
    CASE WHEN len(w) < 2 THEN w ELSE list_concat(w,
      list_transform(range(1, len(w)), g -> w[g] || ' ' || w[g + 1]))
    END) AS gram)
),
FT AS (
  SELECT doc_id, source, ({hash60_sql('gram')} % {DSIR_B}) AS f FROM G
),
C AS (
  SELECT f, count(*) AS cr,
         count(*) FILTER (WHERE source = '{DSIR_TARGET_SOURCE}') AS ct
  FROM FT GROUP BY f
),
R AS (
  SELECT f,
         ln((ct + 1.0) / (sum(ct) OVER () + {DSIR_B}.0))
         - ln((cr + 1.0) / (sum(cr) OVER () + {DSIR_B}.0)) AS lr
  FROM C
),
S AS (
  SELECT doc_id, count(*) AS n_feats,
         {sql_round6('avg(lr)')} AS avg_logratio
  FROM FT JOIN R USING (f) GROUP BY doc_id
)
SELECT doc_id, n_feats, avg_logratio, (avg_logratio > 0.0) AS in_domain
FROM S ORDER BY doc_id
"""


LM_BIGRAM_LAMBDA = 0.7   # interpolation weight on the bigram MLE
LM_BIGRAM_NLL_THRESHOLD = 3.416  # ~p90 at sf0.01 (measured: median
#                                  3.3878, p90 3.4160, max 3.6378 — the
#                                  synthetic word-soup corpus has
#                                  near-independent tokens, so the
#                                  bigram gain over the unigram LM is
#                                  small HERE; on real text the
#                                  conditional model separates far more)


def q_lm_perplexity_bigram(spark, sf_dir,
                           lam: float = LM_BIGRAM_LAMBDA):
    """Interpolated-bigram LM quality filter — the next rung of the
    KenLM ladder the unigram op (q_lm_perplexity) documents:
    p(w_i | w_{i-1}) = lam * MLE_bigram + (1-lam) * MLE_unigram, first
    token scored by the unigram alone; per-doc mean NLL and a
    high-perplexity flag at the measured p90. Production scores
    held-out text where the unigram interpolation IS the backoff; the
    self-trained gate corpus always has the bigram, the interpolation
    still separates formulaic from unusual word order.

    Scale shape: positions stay IN-ROW (one transform->explode carrying
    (tok, prev) structs — no self-join on position, no lag window);
    unigram/bigram/context counts are three map-side-combinable aggs;
    scoring is hash joins on tok and (prev, tok) — vocab- and
    vocab^2-bounded sides AQE broadcasts when small; one final agg."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w"))
    pos_expr = (
        "transform(sequence(1, size(w)), i -> struct("
        "element_at(w, i) AS tok, "
        "CASE WHEN i > 1 THEN element_at(w, i - 1) END AS prev))")
    p = (base.select("doc_id", F.explode(F.expr(pos_expr)).alias("s"))
         .select("doc_id", "s.tok", "s.prev"))
    total = p.agg(F.count("*").alias("n"))
    uni = (p.groupBy("tok").agg(F.count("*").alias("ucnt"))
           .crossJoin(F.broadcast(total))
           .select("tok", (F.col("ucnt") / F.col("n")).alias("p_uni")))
    big = (p.filter(F.col("prev").isNotNull())
           .groupBy("prev", "tok").agg(F.count("*").alias("bcnt")))
    ctx = big.groupBy("prev").agg(F.sum("bcnt").alias("ccnt"))
    scored = (p.join(uni, "tok")
              .join(big, ["prev", "tok"], "left")
              .join(ctx, "prev", "left")
              .select("doc_id", F.when(
                  F.col("prev").isNull(), F.col("p_uni")).otherwise(
                  lam * F.coalesce(F.col("bcnt") / F.col("ccnt"),
                                   F.lit(0.0))
                  + (1.0 - lam) * F.col("p_uni")).alias("prob")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_tok"),
                 round6(F.avg(-F.log("prob"))).alias("avg_nll"))
            .select("doc_id", "n_tok", "avg_nll",
                    (F.col("avg_nll") > LM_BIGRAM_NLL_THRESHOLD)
                    .alias("high_perplexity"))
            .orderBy("doc_id"))


SQL_LM_PERPLEXITY_BIGRAM = f"""
WITH B AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
P AS (
  SELECT doc_id, w[i] AS tok,
         CASE WHEN i > 1 THEN w[i - 1] END AS prev
  FROM B, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i)
),
tot AS (SELECT count(*) AS n FROM P),
uni AS (
  SELECT tok, count(*) / n::DOUBLE AS p_uni
  FROM P, tot GROUP BY tok, n
),
big AS (
  SELECT prev, tok, count(*) AS bcnt FROM P
  WHERE prev IS NOT NULL GROUP BY prev, tok
),
ctx AS (SELECT prev, sum(bcnt) AS ccnt FROM big GROUP BY prev),
s AS (
  SELECT p.doc_id,
         CASE WHEN p.prev IS NULL THEN u.p_uni
              ELSE {LM_BIGRAM_LAMBDA} *
                   coalesce(b.bcnt / c.ccnt::DOUBLE, 0.0)
                   + (1.0 - {LM_BIGRAM_LAMBDA}) * u.p_uni END AS prob
  FROM P p
  JOIN uni u USING (tok)
  LEFT JOIN big b ON b.prev = p.prev AND b.tok = p.tok
  LEFT JOIN ctx c ON c.prev = p.prev
),
a AS (
  SELECT doc_id, count(*) AS n_tok,
         {sql_round6('avg(-ln(prob))')} AS avg_nll
  FROM s GROUP BY doc_id
)
SELECT doc_id, n_tok, avg_nll,
       (avg_nll > {LM_BIGRAM_NLL_THRESHOLD}) AS high_perplexity
FROM a ORDER BY doc_id
"""


# --- model-based quality classifier (r5) -----------------------------------
NB_B = 1024  # hashed-feature buckets, same bound discipline as DSIR_B

# deterministic language markers (real function words per lang) — see the
# planting contract in q_quality_classifier's docstring
NB_MARKERS = {
    "en": "the of and with for",
    "zh": "的 了 在 是 我",
    "es": "el de y en que",
    "de": "der und die das ein",
    "fr": "le de et la les",
}

_NB_MARKER_SQL = " ".join(
    f"WHEN lang = '{lg}' THEN ' {ws}'" for lg, ws in NB_MARKERS.items())


def q_quality_classifier(spark, sf_dir):
    """Model-based quality filtering (the CCNet fastText / GPT-3
    logistic-classifier pipeline stage): a Naive Bayes classifier over
    hashed unigram features, trained IN-QUERY on a labeled proxy
    (lang == 'en' here — the driver tables carry no quality labels) and
    scoring every document with the smoothed log-odds. Swap the label
    column for human/LLM quality labels and the same plumbing is the
    production quality filter; prediction thresholds on the ROUNDED
    score so the two engines can never disagree at the boundary.

    Planting contract (same as q_pii_redact / q_url_stats): the
    synthetic corpus draws EVERY language's text from one shared
    wordlist, so the table carries no language-correlated vocabulary at
    all — a label no classifier could beat chance on. Deterministic
    language-marker function words are appended per doc (the vocabulary
    real language ID keys on), and the classifier is required to LEARN
    them from counts: resubstitution accuracy >= 0.9 is asserted in
    tests — evidence the training/scoring plumbing works, not a claim
    about the synthetic corpus.

    Scale shape: class-conditional feature counts are ONE map-side-
    combinable aggregation over the token explode (both classes counted
    in the same agg via FILTER); the log-likelihood-ratio table is at
    most NB_B rows (the lit(1) window below runs over that bounded
    frame only — same documented pattern as DSIR); the scoring join
    broadcasts it; the prior is a broadcast 1-row aggregate. No UDF, no
    cartesian, training data never shuffles twice."""
    from pyspark.sql.window import Window
    d = t(spark, sf_dir, "documents")
    marker = F.coalesce(
        *[F.when(F.col("lang") == lg, F.lit(" " + ws))
          for lg, ws in NB_MARKERS.items()],
        F.lit(""))
    labels = d.select("doc_id", (F.col("lang") == "en").alias("y"))
    toks = (d.select("doc_id", (F.col("lang") == "en").alias("y"),
                     F.explode(F.split(F.concat(F.col("text"), marker),
                                       " ")).alias("tok"))
            .select("doc_id", "y",
                    F.pmod(hash60("tok"), F.lit(NB_B)).alias("f")))
    cnts = toks.groupBy("f").agg(
        F.count(F.when(F.col("y"), True)).alias("c1"),
        F.count(F.when(~F.col("y"), True)).alias("c0"))
    w = Window.partitionBy(F.lit(1))  # <= NB_B rows by construction
    llr = cnts.select(
        "f",
        (F.log((F.col("c1") + 1.0)
               / (F.sum("c1").over(w) + float(NB_B)))
         - F.log((F.col("c0") + 1.0)
                 / (F.sum("c0").over(w) + float(NB_B)))).alias("llr"))
    prior = labels.agg(
        (F.log(F.count(F.when(F.col("y"), True)) + 0.0)
         - F.log(F.count(F.when(~F.col("y"), True)) + 0.0))
        .alias("prior"))
    scored = (toks.join(llr, "f")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_toks"), F.sum("llr").alias("s")))
    return (scored.crossJoin(F.broadcast(prior))
            .join(labels, "doc_id")
            .select("doc_id", "n_toks",
                    round6(F.col("s") + F.col("prior")).alias("score"),
                    "y")
            .select("doc_id", "n_toks", "score",
                    (F.col("score") > 0.0).alias("pred_en"),
                    ((F.col("score") > 0.0) == F.col("y"))
                    .alias("correct"))
            .orderBy("doc_id"))


SQL_QUALITY_CLASSIFIER = f"""
WITH L AS (
  SELECT doc_id, (lang = 'en') AS y FROM documents
),
T AS (
  SELECT doc_id, y, ({hash60_sql('tok')} % {NB_B}) AS f
  FROM (SELECT d.doc_id, l.y,
               unnest(string_split(
                 d.text || CASE {_NB_MARKER_SQL} ELSE '' END,
                 ' ')) AS tok
        FROM documents d JOIN L l USING (doc_id))
),
C AS (
  SELECT f, count(*) FILTER (WHERE y) AS c1,
         count(*) FILTER (WHERE NOT y) AS c0
  FROM T GROUP BY f
),
R AS (
  SELECT f,
         ln((c1 + 1.0) / (sum(c1) OVER () + {NB_B}.0))
         - ln((c0 + 1.0) / (sum(c0) OVER () + {NB_B}.0)) AS llr
  FROM C
),
P AS (
  SELECT ln(count(*) FILTER (WHERE y) * 1.0)
         - ln(count(*) FILTER (WHERE NOT y) * 1.0) AS prior
  FROM L
),
S AS (
  SELECT doc_id, count(*)::BIGINT AS n_toks, sum(llr) AS s
  FROM T JOIN R USING (f) GROUP BY doc_id
),
FI AS (
  SELECT s.doc_id, s.n_toks, {sql_round6('s.s + p.prior')} AS score
  FROM S s CROSS JOIN P p
)
SELECT f.doc_id, f.n_toks, f.score, (f.score > 0.0) AS pred_en,
       ((f.score > 0.0) = l.y) AS correct
FROM FI f JOIN L l USING (doc_id)
ORDER BY f.doc_id
"""


QUERIES = {
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "lm_perplexity_bigram": (q_lm_perplexity_bigram,
                             SQL_LM_PERPLEXITY_BIGRAM),
    "substring_dedup": (q_substring_dedup, SQL_SUBSTRING_DEDUP),
    "lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
    "line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "length_quantiles": (q_length_quantiles, SQL_LENGTH_QUANTILES),
    "domain_mix": (q_domain_mix, SQL_DOMAIN_MIX),
    "contamination_check": (q_contamination_check,
                            SQL_CONTAMINATION_CHECK),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "json_props_agg": (q_json_props_agg, SQL_JSON_PROPS_AGG),
    "quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
}
