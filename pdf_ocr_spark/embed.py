"""Deterministic hashed n-gram document embeddings (feature hashing).

Signed feature hashing (Weinberger et al. 2009, "Feature Hashing for
Large Scale Multitask Learning"): unigram+bigram counts hashed into a
fixed-D vector with a +/-1 sign drawn from an independent bit of the
same hash, then L2-normalized. The sign is what makes the geometry
honest: E[cosine] of two unrelated documents is 0 (collision terms
cancel in expectation), identical documents score exactly 1.0, and
partially-overlapping documents score ~their shared gram-mass fraction.
Unsigned count hashing at small D would give unrelated documents a
large positive baseline cosine (~n/(n+D) for n grams), destroying the
near-dup threshold.

This is the pipeline's own embedding column (VERDICT r4 #2): the same
hashed-gram projection DSIR already uses for importance weights
(relational/curation.py q_dsir_weights) — re-expressed as a unit vector
over extracted_text so the embedding-similarity family (semdedup,
embedding clusters, ANN) composes with the extraction output instead of
only the driver's synthetic embeddings table. A production deployment
would swap this for a neural encoder output; every downstream operator
only assumes (id, unit-norm array<double>).

Scale shape: one gram explode -> ONE map-side-combinable aggregation
(D conditional sums) per document -> in-row normalize. No UDF, no join,
one shuffle keyed by doc_id; output is D doubles per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .relational.util import hash60

EMBED_DIM = 64


def embed_docs(d: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """(doc_id, text) -> (doc_id, embedding: array<double>, unit norm).

    Grams are DSIR's unigrams+bigrams over whitespace-NORMALIZED text
    (extracted_text joins pages and paragraphs with newlines; a raw
    single-space split would fuse tokens across paragraph boundaries —
    same normalization rationale as curate_corpus). bucket =
    hash60(gram) mod dim; sign = bit 20 of the same hash, far from the
    low bits the bucket consumes, so bucket and sign are independent.

    Documents whose signed sums cancel to an exactly-zero vector
    (astronomically unlikely for real text) are dropped rather than
    emitted: a zero vector's cosine is NaN, and Spark's comparison
    semantics order NaN ABOVE every threshold, which would turn such a
    row into a universal near-duplicate."""
    base = d.select(
        "doc_id",
        F.split(F.trim(F.regexp_replace("text", "\\s+", " ")), " ")
        .alias("w"))
    # unigrams + bigrams, guarded so 1-token docs never hit Spark's
    # descending sequence(1, 0) == [1, 0] (same guard as q_dsir_weights)
    grams_expr = (
        "CASE WHEN size(w) < 2 THEN w ELSE concat(w, "
        "transform(sequence(1, size(w) - 1), "
        "g -> concat_ws(' ', element_at(w, g), element_at(w, g + 1)))) "
        "END")
    g = (base.select("doc_id", F.explode(F.expr(grams_expr)).alias("gram"))
         .select("doc_id",
                 F.pmod(hash60("gram"), F.lit(dim)).alias("f"),
                 F.when(F.pmod(F.shiftright(hash60("gram"), 20),
                               F.lit(2)) == 1,
                        F.lit(1.0)).otherwise(F.lit(-1.0)).alias("sgn")))
    agg = g.groupBy("doc_id").agg(
        *[F.sum(F.when(F.col("f") == i, F.col("sgn")).otherwise(0.0))
          .alias(f"c{i}") for i in range(dim)])
    vec = F.array(*[F.col(f"c{i}") for i in range(dim)])
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    return (agg.select("doc_id", vec.alias("v"), norm.alias("n"))
            .filter(F.col("n") > 0)
            .select("doc_id",
                    F.transform(F.col("v"), lambda x: x / F.col("n"))
                    .alias("embedding")))
