"""SURVEY.md §2 operator analogs over the driver's testdata tables.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, duckdb_sql).
Output column names are identical on both sides (the driver's compare sorts
columns by name before value-hashing). Floats rounded to 6 decimals,
timestamps emitted as ISO strings truncated to seconds.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import round6, t


# --- P1/A2: per-document page classification → type decision --------------
def q_pdf_type_classify(spark, sf_dir):
    """Reference P1 (pdf_detector.py:38-122): pages >= threshold are text
    pages; doc type = all-text/all-image/mixed. Analog: lineitem lines with
    l_quantity >= 25 are 'text pages' of their order."""
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("text_pages"),
        F.count(F.when(F.col("l_quantity") < 25, 1)).alias("image_pages"),
    )
    typed = per_order.withColumn(
        "pdf_type",
        F.when(F.col("image_pages") == 0, "text")
        .when(F.col("text_pages") == 0, "image")
        .otherwise("mixed"))
    return (typed.groupBy("pdf_type")
            .agg(F.count("*").alias("n_docs"),
                 round6(F.avg("text_pages")).alias("avg_text_pages"))
            .orderBy("pdf_type"))


SQL_PDF_TYPE_CLASSIFY = """
WITH per_order AS (
  SELECT l_orderkey,
         count(*) FILTER (WHERE l_quantity >= 25) AS text_pages,
         count(*) FILTER (WHERE l_quantity < 25) AS image_pages
  FROM lineitem GROUP BY l_orderkey
)
SELECT CASE WHEN image_pages = 0 THEN 'text'
            WHEN text_pages = 0 THEN 'image'
            ELSE 'mixed' END AS pdf_type,
       count(*) AS n_docs,
       (floor((avg(text_pages)) * 1000000.0 + 0.5) / 1000000.0) AS avg_text_pages
FROM per_order GROUP BY 1 ORDER BY pdf_type
"""


# --- P2: >50-item sampling selection (head 15 / mid 15 / tail 15) ---------
def q_detect_sampling(spark, sf_dir):
    """Reference P2 sampling arithmetic (pdf_detector.py:61-67) applied to
    each user's event sequence: events are 'pages', sequence position is the
    page index; count how many land in the head/mid/tail sample."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("i", F.row_number().over(w) - 1) \
        .withColumn("cnt", F.count("*").over(Window.partitionBy("user_id")))
    mid_lo = F.greatest(F.floor(F.col("cnt") / 2) - 7, F.lit(0))
    mid_hi = F.least(F.floor(F.col("cnt") / 2) + 8, F.col("cnt"))
    sampled = F.when(
        F.col("cnt") <= 50, F.lit(True)
    ).otherwise(
        (F.col("i") < 15) | (F.col("i") >= F.col("cnt") - 15)
        | ((F.col("i") >= mid_lo) & (F.col("i") < mid_hi)))
    return (seq.withColumn("is_sampled", sampled)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.count(F.when(F.col("is_sampled"), 1)).alias("n_sampled"))
            .orderBy("user_id"))


SQL_DETECT_SAMPLING = """
WITH seq AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - 1 AS i,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
)
SELECT user_id, count(*) AS n_events,
       count(*) FILTER (WHERE cnt <= 50 OR i < 15 OR i >= cnt - 15
                        OR (i >= greatest(cnt // 2 - 7, 0)
                            AND i < least(cnt // 2 + 8, cnt)))
         AS n_sampled
FROM seq GROUP BY user_id ORDER BY user_id
"""


# --- S1: payload validation filter ---------------------------------------
def q_validate_payloads(spark, sf_dir):
    """Reference S1 (file_manager.py:60-96): existence/suffix/magic checks
    route rows to valid/invalid instead of dropping. Analog predicate:
    doc text starts lowercase AND has >= 50 chars (the text-page
    threshold, config.py:54)."""
    d = t(spark, sf_dir, "documents")
    return (d.withColumn(
        "is_valid",
        F.col("text").rlike("^[a-z]") & (F.length(F.trim("text")) >= 50))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.count(F.when(F.col("is_valid"), 1)).alias("n_valid"))
        .orderBy("source"))


SQL_VALIDATE_PAYLOADS = """
SELECT source, count(*) AS n_docs,
       count(*) FILTER (WHERE regexp_matches(text, '^[a-z]')
                        AND length(trim(text)) >= 50) AS n_valid
FROM documents GROUP BY source ORDER BY source
"""


# --- S4: content hash ------------------------------------------------------
def q_content_md5(spark, sf_dir):
    """Reference S4 (file_manager.py:137-143): chunked MD5 of the payload →
    built-in md5() over the text column."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("content_md5")) \
        .orderBy("doc_id")


SQL_CONTENT_MD5 = """
SELECT doc_id, md5(text) AS content_md5 FROM documents ORDER BY doc_id
"""


# --- S12: history listing ---------------------------------------------------
def q_history_listing(spark, sf_dir):
    """Reference S12 (history.py:31-69): task listing sorted by updated_at
    desc — per user: latest event time + counts."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
                 .alias("last_seen"),
                 F.count("*").alias("n_events"))
            .orderBy(F.desc("last_seen"), "user_id"))


SQL_HISTORY_LISTING = """
SELECT user_id, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY last_seen DESC, user_id
"""


# --- S13: TTL cleanup -------------------------------------------------------
def q_ttl_cleanup(spark, sf_dir):
    """Reference S13 (file_manager.py:157-184): delete artifacts older than
    24h → partition rows into expired/live relative to the newest event."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (ev.crossJoin(F.broadcast(mx))
            .withColumn("expired",
                        F.col("ts") < F.col("max_ts")
                        - F.expr("INTERVAL 24 HOURS"))
            .groupBy("expired").agg(F.count("*").alias("n_events"))
            .orderBy("expired"))


SQL_TTL_CLEANUP = """
SELECT ts < (SELECT max(ts) FROM events) - INTERVAL 24 HOUR AS expired,
       count(*) AS n_events
FROM events GROUP BY 1 ORDER BY expired
"""


# --- L7/S7: ordered page assembly ------------------------------------------
def q_page_assembly(spark, sf_dir):
    """Reference L7/S7 (txt_export.py:61-77): paragraphs joined with a fixed
    separator in page order — per source, doc snippets joined '\\n\\n'
    ordered by doc_id."""
    d = t(spark, sf_dir, "documents")
    return (d.withColumn("snip", F.substring("text", 1, 20))
            .groupBy("source")
            .agg(F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(doc_id, snip))), x -> x.snip), '\n\n')")
                .alias("assembled"))
            .orderBy("source"))


SQL_PAGE_ASSEMBLY = """
SELECT source,
       string_agg(substr(text, 1, 20), '\n\n' ORDER BY doc_id) AS assembled
FROM documents GROUP BY source ORDER BY source
"""


# --- L4/A6: repeated header/footer = group-by + having ----------------------
def q_header_footer_having(spark, sf_dir):
    """Reference L4 (postprocess.py:333-344): Counter over first paragraphs,
    threshold >= 3 — first token of each doc, repeated-token report."""
    d = t(spark, sf_dir, "documents")
    return (d.withColumn("first_token", F.split("text", " ").getItem(0))
            .groupBy("first_token")
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= 3)
            .orderBy(F.desc("n_docs"), "first_token"))


SQL_HEADER_FOOTER_HAVING = """
SELECT split_part(text, ' ', 1) AS first_token, count(*) AS n_docs
FROM documents GROUP BY 1 HAVING count(*) >= 3
ORDER BY n_docs DESC, first_token
"""


# --- A3: mean-of-means vs flat mean -----------------------------------------
def q_mean_of_means(spark, sf_dir):
    """Reference A3 (postprocess.py:41-44): document confidence is the mean
    of paragraph means, not the flat line mean — per order priority: both
    statistics over l_discount, demonstrating they differ."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.avg("l_discount").alias("order_avg"),
        F.count("*").alias("n_lines"),
        F.sum("l_discount").alias("sum_disc"))
    # no broadcast hint: orders is a fact table (scales with the
    # corpus), not a dim — the optimizer broadcasts it from stats at
    # gate scale and sort-merges at 100 TB; a forced hint would pin a
    # corpus-sized build side
    joined = per_order.join(
        o.select("o_orderkey", "o_orderpriority"),
        per_order.l_orderkey == o.o_orderkey)
    return (joined.groupBy("o_orderpriority")
            .agg(round6(F.avg("order_avg")).alias("mean_of_means"),
                 round6(F.sum("sum_disc") / F.sum("n_lines"))
                 .alias("flat_mean"))
            .orderBy("o_orderpriority"))


SQL_MEAN_OF_MEANS = """
WITH per_order AS (
  SELECT l_orderkey, avg(l_discount) AS order_avg, count(*) AS n_lines,
         sum(l_discount) AS sum_disc
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderpriority,
       (floor((avg(order_avg)) * 1000000.0 + 0.5) / 1000000.0) AS mean_of_means,
       (floor((sum(sum_disc) / sum(n_lines)) * 1000000.0 + 0.5) / 1000000.0) AS flat_mean
FROM per_order JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- P8: low-confidence projection ------------------------------------------
def q_low_confidence(spark, sf_dir):
    """Reference P8 (engine.py:70-74): lines under the 0.5 confidence
    threshold — lineitems under 0.05 discount per return flag."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_discount") < 0.05)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n_low"),
                 round6(F.avg("l_discount")).alias("avg_disc"))
            .orderBy("l_returnflag"))


SQL_LOW_CONFIDENCE = """
SELECT l_returnflag, count(*) AS n_low,
       (floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0) AS avg_disc
FROM lineitem WHERE l_discount < 0.05
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- P4: page selection normalization ---------------------------------------
def q_distinct_sorted_pages(spark, sf_dir):
    """Reference P4 (api/ocr.py:59-65): sorted(set(pages)) — per order, the
    sorted distinct line numbers as a csv string."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_orderkey") < 400)
            .groupBy("l_orderkey")
            .agg(F.expr(
                "array_join(transform(array_sort(collect_set(l_linenumber))"
                ", x -> cast(x as string)), ',')").alias("pages"))
            .orderBy("l_orderkey"))


SQL_DISTINCT_SORTED_PAGES = """
SELECT l_orderkey,
       string_agg(ln, ',' ORDER BY lnum) AS pages
FROM (SELECT DISTINCT l_orderkey, l_linenumber AS lnum,
             CAST(l_linenumber AS VARCHAR) AS ln
      FROM lineitem WHERE l_orderkey < 400)
GROUP BY l_orderkey ORDER BY l_orderkey
"""


# --- L1/O3 + §2.8: reading-order sort / window ordering ---------------------
def q_reading_order(spark, sf_dir):
    """Reference L1 (postprocess.py:92) reading order (y, x) — first three
    events per user by (ts, event_id)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("user_id", "rn", "event_id", "event_type")
            .orderBy("user_id", "rn"))


SQL_READING_ORDER = """
SELECT user_id, rn, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
) WHERE rn <= 3 ORDER BY user_id, rn
"""


# --- P5: margin-band filter --------------------------------------------------
def q_margin_filter(spark, sf_dir):
    """Reference P5 (postprocess.py:126-165): drop rows whose center falls
    in a configured band, plus a heuristic kill inside the bottom band —
    events outside value [10, 90] dropped; 'error' events above 85 also
    killed (the page-number heuristic analog)."""
    ev = t(spark, sf_dir, "events")
    ignored = (F.col("value") < 10) | (F.col("value") > 90) | \
        ((F.col("value") > 85) & (F.col("event_type") == "error"))
    return (ev.withColumn("ignored", ignored)
            .groupBy("event_type")
            .agg(F.count(F.when(~F.col("ignored"), 1)).alias("n_kept"),
                 F.count(F.when(F.col("ignored"), 1)).alias("n_dropped"))
            .orderBy("event_type"))


SQL_MARGIN_FILTER = """
SELECT event_type,
       count(*) FILTER (WHERE NOT (value < 10 OR value > 90
                        OR (value > 85 AND event_type = 'error')))
         AS n_kept,
       count(*) FILTER (WHERE value < 10 OR value > 90
                        OR (value > 85 AND event_type = 'error'))
         AS n_dropped
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- L6: text normalization --------------------------------------------------
def q_text_normalize(spark, sf_dir):
    """Reference L6 (postprocess.py:375-401): regexp_replace chain —
    collapse space runs, space after ASCII punctuation before a letter."""
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.regexp_replace(F.col("text"), "([,.:;!?])([a-zA-Z])", r"$1 $2"),
        " +", " ")
    return (d.select("doc_id",
                     F.substring(F.trim(norm), 1, 60).alias("norm_head"))
            .orderBy("doc_id"))


SQL_TEXT_NORMALIZE = r"""
SELECT doc_id,
       substr(trim(regexp_replace(
           regexp_replace(text, '([,.:;!?])([a-zA-Z])', '\1 \2', 'g'),
           ' +', ' ', 'g')), 1, 60) AS norm_head
FROM documents ORDER BY doc_id
"""


# --- A8/C6: progress / error-rate metrics ------------------------------------
def q_error_rate(spark, sf_dir):
    """Reference A8 progress percent (api/ocr.py:124) + C6 error containment
    — per user error percentage."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.count("*").alias("n_total"),
                 F.count(F.when(F.col("event_type") == "error", 1))
                 .alias("n_errors"))
            .withColumn("error_pct",
                        round6(F.col("n_errors") * 100.0
                                / F.col("n_total")))
            .orderBy("user_id"))


SQL_ERROR_RATE = """
SELECT user_id, count(*) AS n_total,
       count(*) FILTER (WHERE event_type = 'error') AS n_errors,
       (floor((count(*) FILTER (WHERE event_type = 'error') * 100.0
             / count(*)) * 1000000.0 + 0.5) / 1000000.0) AS error_pct
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- S11: coordinate transform arithmetic ------------------------------------
def q_coord_scale(spark, sf_dir):
    """Reference S11 (searchable_pdf.py:79-92): img coords * 72/dpi, font
    size h*scale*0.8 clamped to min 8 — the same arithmetic as columns."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_orderkey") < 200)
            .select(
                "l_orderkey", "l_linenumber",
                round6(F.col("l_extendedprice") * 72.0 / 300.0)
                .alias("pdf_x"),
                round6(F.greatest(F.col("l_quantity") * 0.8, F.lit(8.0))).alias("font_size"))
            .orderBy("l_orderkey", "l_linenumber"))


SQL_COORD_SCALE = """
SELECT l_orderkey, l_linenumber,
       (floor((l_extendedprice * 72.0 / 300.0) * 1000000.0 + 0.5) / 1000000.0) AS pdf_x,
       (floor((greatest(l_quantity * 0.8, 8.0)) * 1000000.0 + 0.5) / 1000000.0) AS font_size
FROM lineitem WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
"""


# --- S7: page-separator assembly (exact reference template) -----------------
def q_page_separator_assembly(spark, sf_dir):
    """Reference S7 (txt_export.py:61-77): page separator
    '\\n\\n--- 第 {page} 页 ---\\n\\n' (1-based) emitted only between
    pages — per source, the first 3 docs as 'pages'."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    rows = (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .withColumn("piece", F.concat(
                F.when(F.col("rn") > 1,
                       F.concat(F.lit("\n\n--- 第 "), F.col("rn"),
                                F.lit(" 页 ---\n\n")))
                .otherwise(F.lit("")),
                F.substring("text", 1, 15))))
    return (rows.groupBy("source")
            .agg(F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(rn, piece))), x -> x.piece), '')")
                .alias("txt_export"))
            .orderBy("source"))


SQL_PAGE_SEPARATOR_ASSEMBLY = """
WITH rows_ AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         substr(text, 1, 15) AS snip
  FROM documents
)
SELECT source,
       string_agg(
         CASE WHEN rn > 1
              THEN e'\\n\\n--- 第 ' || rn || e' 页 ---\\n\\n' || snip
              ELSE snip END, '' ORDER BY rn) AS txt_export
FROM rows_ WHERE rn <= 3
GROUP BY source ORDER BY source
"""


# --- P6: skip-OCR routing ----------------------------------------------------
def q_skip_ocr_routing(spark, sf_dir):
    """Reference P6 (api/ocr.py:205-226): per page, route to the cheap
    extract path or the expensive OCR path — per order priority, how many
    lines take each route and the expensive-path share."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    routed = li.withColumn(
        "route", F.when(F.col("l_quantity") >= 25, "extract")
        .otherwise("ocr"))
    # no broadcast hint — same rationale as q_mean_of_means: orders
    # scales with the corpus; the optimizer picks the strategy
    joined = routed.join(
        o.select("o_orderkey", "o_orderpriority"),
        routed.l_orderkey == o.o_orderkey)
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.when(F.col("route") == "extract", 1))
                 .alias("n_extract"),
                 F.count(F.when(F.col("route") == "ocr", 1))
                 .alias("n_ocr"))
            .withColumn("ocr_share",
                        round6(F.col("n_ocr")
                               / (F.col("n_ocr") + F.col("n_extract"))))
            .orderBy("o_orderpriority"))


SQL_SKIP_OCR_ROUTING = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE l_quantity >= 25) AS n_extract,
       count(*) FILTER (WHERE l_quantity < 25) AS n_ocr,
       (floor((count(*) FILTER (WHERE l_quantity < 25)::DOUBLE / count(*))
              * 1000000.0 + 0.5) / 1000000.0) AS ocr_share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- sessionization (stateful-window depth for event streams) --------------
def q_sessionize(spark, sf_dir):
    """Sessionize user events with a 30-minute inactivity gap: lag ->
    new-session flag -> running sum = session id (the scalable
    sessionization pattern; one shuffle on user_id)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - \
        F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn(
        "session_seq", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 (F.max(F.col("ts").cast("timestamp").cast("long"))
                  - F.min(F.col("ts").cast("timestamp").cast("long")))
                 .alias("duration_s"))
            .orderBy("user_id", "session_seq"))


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING))::BIGINT
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT
         AS duration_s
FROM sess GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# --- top tokens (explode/frequency depth) -----------------------------------
def q_top_tokens(spark, sf_dir):
    """Corpus-level token frequency: explode words, count, top 20 by
    (count desc, token) — partial aggregation combines map-side, only
    token counts shuffle."""
    d = t(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split("text", " ")).alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "token").limit(20))


SQL_TOP_TOKENS = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# --- conversation assembly (L7 lifted to conversation granularity) ----------
def q_conversation_assembly(spark, sf_dir):
    """Training-data export shape (export.assemble_conversations, the
    conversation-level analog of the reference's page->doc "\\n\\n" join,
    api/ocr.py:140): per user, event types joined in stable (ts, event_id)
    order. JVM-only sort_array over collected structs — no UDF, one
    shuffle."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(ts, event_id, event_type))), x -> x.event_type), "
                "'\\n\\n')").alias("event_stream"),
                F.count("*").alias("n_events"))
            .orderBy("user_id"))


SQL_CONVERSATION_ASSEMBLY = """
SELECT user_id,
       string_agg(event_type, chr(10) || chr(10)
                  ORDER BY ts, event_id) AS event_stream,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- repeated-content boilerplate flag (L4 at corpus granularity) -----------
def q_boilerplate_docs(spark, sf_dir):
    """The reference's repeated header/footer heuristic
    (postprocess.py:315-359: text recurring >= 3 times is boilerplate)
    lifted to corpus granularity: a document whose exact text appears >= 3
    times within its source is flagged (pipeline.flag_repeated_turns is
    the turn-level twin). One window over (source, content-hash)."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source", F.md5("text"))
    return (d.withColumn("n_copies", F.count("*").over(w))
            .withColumn("is_boilerplate",
                        (F.col("n_copies") >= 3)
                        & (F.length("text") > 0))
            .select("doc_id", "n_copies", "is_boilerplate")
            .orderBy("doc_id"))


SQL_BOILERPLATE_DOCS = """
SELECT doc_id,
       count(*) OVER (PARTITION BY source, md5(text)) AS n_copies,
       (count(*) OVER (PARTITION BY source, md5(text)) >= 3
        AND length(text) > 0) AS is_boilerplate
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "pdf_type_classify": (q_pdf_type_classify, SQL_PDF_TYPE_CLASSIFY),
    "conversation_assembly": (q_conversation_assembly,
                              SQL_CONVERSATION_ASSEMBLY),
    "boilerplate_docs": (q_boilerplate_docs, SQL_BOILERPLATE_DOCS),
    "page_separator_assembly": (q_page_separator_assembly,
                                SQL_PAGE_SEPARATOR_ASSEMBLY),
    "skip_ocr_routing": (q_skip_ocr_routing, SQL_SKIP_OCR_ROUTING),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "top_tokens": (q_top_tokens, SQL_TOP_TOKENS),
    "detect_sampling": (q_detect_sampling, SQL_DETECT_SAMPLING),
    "validate_payloads": (q_validate_payloads, SQL_VALIDATE_PAYLOADS),
    "content_md5": (q_content_md5, SQL_CONTENT_MD5),
    "history_listing": (q_history_listing, SQL_HISTORY_LISTING),
    "ttl_cleanup": (q_ttl_cleanup, SQL_TTL_CLEANUP),
    "page_assembly": (q_page_assembly, SQL_PAGE_ASSEMBLY),
    "header_footer_having": (q_header_footer_having,
                             SQL_HEADER_FOOTER_HAVING),
    "mean_of_means": (q_mean_of_means, SQL_MEAN_OF_MEANS),
    "low_confidence": (q_low_confidence, SQL_LOW_CONFIDENCE),
    "distinct_sorted_pages": (q_distinct_sorted_pages,
                              SQL_DISTINCT_SORTED_PAGES),
    "reading_order": (q_reading_order, SQL_READING_ORDER),
    "margin_filter": (q_margin_filter, SQL_MARGIN_FILTER),
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "error_rate": (q_error_rate, SQL_ERROR_RATE),
    "coord_scale": (q_coord_scale, SQL_COORD_SCALE),
}
