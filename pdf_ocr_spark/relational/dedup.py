"""Deduplication operators for training-data pipelines (documents table).

Exact (hash group-by), MinHash+LSH banding with Jaccard verification, and
SimHash clustering. All hash arithmetic uses the portable md5-based 60-bit
hash (util.hash60) reduced mod 1e9+7 so Spark and the DuckDB oracle agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .util import round6, MINHASH_A, MINHASH_B, MOD, hash60_sql, t

_SHINGLE_EXPR = (
    "transform(sequence(1, size(w) - 2), g -> concat_ws(' ', "
    "element_at(w, g), element_at(w, g + 1), element_at(w, g + 2)))"
)

_SHINGLE_SQL = (
    "list_transform(range(1, greatest(len(w) - 1, 1)), "
    "g -> w[g] || ' ' || w[g + 1] || ' ' || w[g + 2])"
)


def _shingles(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (d.select("doc_id", F.split("text", " ").alias("w"))
            .filter(F.size("w") >= 3)
            .select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("s"))
            .distinct())


_SHINGLES_CTE = f"""
  shingles AS (
    SELECT DISTINCT doc_id, unnest({_SHINGLE_SQL}) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 3
  )
"""


# --- exact dedup ------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content-hash group-by (reference S4 md5 +
    set()-dedup patterns, file_manager.py:137-143): per source, documents
    vs distinct texts vs duplicate rows."""
    d = t(spark, sf_dir, "documents")
    return (d.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct(F.md5("text")).alias("n_distinct"),
                 (F.count("*") - F.countDistinct(F.md5("text")))
                 .alias("n_dup_rows"))
            .orderBy("source"))


SQL_DEDUP_EXACT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct,
       count(*) - count(DISTINCT md5(text)) AS n_dup_rows
FROM documents GROUP BY source ORDER BY source
"""


# --- MinHash + LSH banding + Jaccard verify ---------------------------------
def _sig_cols():
    h2 = (F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10)
          .cast("long") % MOD)
    return [
        F.min((F.lit(a) * h2 + F.lit(b)) % MOD).alias(f"sig{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def q_dedup_minhash(spark, sf_dir):
    """MinHash signatures (8 hashes over word 3-gram shingles), 2 bands of
    4 -> candidate pairs by band collision -> exact Jaccard verification.

    Scale shape: the band join is an equi-join on band signature (shuffles
    only signature rows, never documents); Jaccard verify joins shingle
    sets for candidate pairs only."""
    sh = _shingles(spark, sf_dir)
    sigs = sh.groupBy("doc_id").agg(*_sig_cols())
    sigs = sigs.withColumn(
        "band0", F.concat_ws("-", "sig0", "sig1", "sig2", "sig3")
    ).withColumn(
        "band1", F.concat_ws("-", "sig4", "sig5", "sig6", "sig7"))
    a = sigs.select(F.col("doc_id").alias("doc_a"), "band0", "band1")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "band0", "band1")
    cand = (
        a.select("doc_a", "band0")
        .join(b.select("doc_b", "band0"), "band0")
        .select("doc_a", "doc_b")
        .union(
            a.select("doc_a", "band1")
            .join(b.select("doc_b", "band1"), "band1")
            .select("doc_a", "doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b")).distinct())
    sa = sh.select(F.col("doc_id").alias("doc_a"), "s")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (cand.join(sa, "doc_a").join(sb, ["doc_b", "s"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    out = (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("n_sh", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            round6(F.col("n_inter")
                    / (F.col("size_a") + F.col("size_b")
                       - F.col("n_inter"))))
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b"))
    return out


def _sig_sql():
    h2 = f"({hash60_sql('s')} % {MOD})"
    terms = ", ".join(
        f"min(({a} * {h2} + {b}) % {MOD}) AS sig{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B)))
    return terms


SQL_DEDUP_MINHASH = f"""
WITH {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, {_sig_sql()} FROM shingles GROUP BY doc_id
),
banded AS (
  SELECT doc_id,
         sig0::VARCHAR || '-' || sig1 || '-' || sig2 || '-' || sig3
           AS band0,
         sig4::VARCHAR || '-' || sig5 || '-' || sig6 || '-' || sig7
           AS band1
  FROM sigs
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b ON a.band0 = b.band0
    UNION
    SELECT a.doc_id, b.doc_id
    FROM banded a JOIN banded b ON a.band1 = b.band1
  ) WHERE doc_a < doc_b
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       (floor((n_inter / (za.n_sh + zb.n_sh - n_inter)) * 1000000.0 + 0.5) / 1000000.0) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
ORDER BY doc_a, doc_b
"""


# --- SimHash ---------------------------------------------------------------
def _simhash_spark():
    h2 = (F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
          .cast("long") % MOD)
    bit_sums = [
        F.sum(F.shiftright(h2, k).bitwiseAND(F.lit(1)) * 2 - 1)
        .alias(f"bs{k}") for k in range(16)
    ]
    return bit_sums


def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash over distinct unigrams: bit k set when the sum of
    (+1/-1) votes from token-hash bit k is >= 0. Equal fingerprints =
    near-duplicate cluster; output is the per-document fingerprint plus
    its cluster size."""
    d = t(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != "").distinct())
    sums = toks.groupBy("doc_id").agg(*_simhash_spark())
    sim = sums.select(
        "doc_id",
        sum((F.when(F.col(f"bs{k}") >= 0, 1).otherwise(0)
             * (1 << k)) for k in range(16)).alias("simhash"))
    counts = sim.groupBy("simhash").agg(F.count("*").alias("cluster_size"))
    return (sim.join(counts, "simhash")
            .select("doc_id", "simhash", "cluster_size")
            .orderBy("doc_id"))


def _simhash_sql():
    h2 = f"({hash60_sql('tok')} % {MOD})"
    bit_exprs = ", ".join(
        f"CASE WHEN sum((({h2} >> {k}) & 1) * 2 - 1) >= 0 "
        f"THEN {1 << k} ELSE 0 END AS bit{k}"
        for k in range(16))
    total = " + ".join(f"bit{k}" for k in range(16))
    return bit_exprs, total


_BITS, _TOTAL = _simhash_sql()

SQL_DEDUP_SIMHASH = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
sums AS (
  SELECT doc_id, {_BITS}
  FROM (SELECT * FROM toks WHERE tok <> '') GROUP BY doc_id
),
sim AS (SELECT doc_id, {_TOTAL} AS simhash FROM sums),
counts AS (SELECT simhash, count(*) AS cluster_size FROM sim
           GROUP BY simhash)
SELECT s.doc_id, s.simhash, c.cluster_size
FROM sim s JOIN counts c ON s.simhash = c.simhash
ORDER BY s.doc_id
"""


QUERIES = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash, SQL_DEDUP_MINHASH),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
}
