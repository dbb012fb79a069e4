"""Shared helpers for the relational layer.

Portability contract with the DuckDB oracle:
  * floats rounded to 6 decimals on both sides before output,
  * timestamps emitted as ISO strings on both sides,
  * no arrays/structs in outputs (stringified with stable delimiters),
  * portable 60-bit string hash: int(md5(s)[0:15], 16) — Spark
    ``conv(substring(md5(s),1,15),16,10)`` == DuckDB
    ``('0x'||substr(md5(s),1,15))::UBIGINT::BIGINT`` (verified bit-equal),
  * derived hashes stay in signed-64 range: h2 = h mod 1e9+7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

MOD = 1_000_000_007


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def round6(col) -> F.Column:
    """Portable 6-decimal rounding: floor(x*1e6 + 0.5)/1e6. Engine round()
    implementations disagree on exact .5 ties in double space (observed:
    Spark HALF_UP vs DuckDB on 0.8178125); floor arithmetic is bit-identical
    when both engines computed the same double."""
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * 1000000.0 + 0.5) / 1000000.0


def sql_round6(expr: str) -> str:
    """DuckDB twin of round6."""
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def hash60(col: str) -> F.Column:
    """Spark side of the portable md5 60-bit hash."""
    return F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10) \
        .cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB side of the portable md5 60-bit hash."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT)"


def salted_mod(key, salt: str, mod: int) -> F.Column:
    """Deterministic bucket in [0, mod): portable 60-bit md5 hash of
    salt || key, reduced mod ``mod``. The salt namespaces independent
    bucketings (split assignment vs pack sharding) so they decorrelate."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))),
                           1, 15), 16, 10).cast("long"),
        F.lit(mod))


def _lcg_floats(seed: int, n: int) -> list:
    """Deterministic floats in [-1, 1) shared by Spark and SQL literals."""
    out = []
    x = (seed * 6364136223846793005 + 1442695040888963407) \
        & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) \
            & 0xFFFFFFFFFFFFFFFF
        out.append(round((x >> 33) / float(1 << 31) * 2.0 - 1.0, 6))
    return out


def _lcg_ints(seed: int, n: int, lo: int, hi: int) -> list:
    out = []
    x = (seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) \
            & 0xFFFFFFFFFFFFFFFF
        out.append(lo + (x >> 33) % (hi - lo))
    return out


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str, max_iters: int = 20,
                         algorithm: str = "pointer") -> DataFrame:
    """Connected components by min-label propagation + pointer jumping:
    every node ends up labeled with the MINIMUM id reachable in its
    component (deterministic fixpoint, independent of iteration order).
    ``edges`` must be symmetric (src, dst both directions).

    ``algorithm="star"`` switches to the alternating large-star /
    small-star variant (Kiveris et al., "Connected Components in
    MapReduce and Beyond"), which contracts high-degree AND
    high-diameter graphs in O(log^2 n) rounds while keeping every
    per-round reducer input bounded by the star neighborhood — the
    escape hatch for adversarial graphs where the label frame itself
    is the bottleneck. Same min-label fixpoint, same return schema.

    Each round does (1) neighbor-min propagation over the edge set and
    (2) a pointer jump — label(v) := min(label(v), label(label(v))) —
    which halves the remaining label-chain depth, so rounds needed are
    O(log diameter) instead of O(diameter) (r3; the shortcut step of the
    Hash-to-Min / large-star family, Rastogi et al. / Kiveris et al.,
    which those papers prove reaches the same min-label fixpoint). The
    jump preserves the invariant that label(v) is always a node
    reachable from v (reachability is transitive), so the fixpoint is
    unchanged — the DuckDB recursive-CTE oracles stay bit-identical.
    Near-dup cliques converge in 2-3 rounds either way; a 10^6-long
    chain needs ~20 rounds instead of 10^6.

    Per-round localCheckpoint truncates plan lineage so each round costs
    two joins + one aggregation. Convergence = the global label sum
    stops falling (labels are monotone non-increasing).

    Raises RuntimeError if the label sum has not stabilized after
    ``max_iters`` rounds: an unconverged labeling silently splits
    clusters and diverges from the recursive-CTE oracle (ADVICE r2) —
    failing loudly is the only correct behavior for an equality-gated
    operator.

    Returns (id_col, cluster_id, cluster_size, is_canonical)."""
    if algorithm == "star":
        labels = _cc_two_phase(nodes, edges, id_col, max_iters)
        return _cc_finalize(labels, id_col)
    if algorithm != "pointer":
        raise ValueError(f"unknown CC algorithm: {algorithm!r}")

    # the convergence probe sums labels exactly: decimal(38,0), not
    # long — ids may span the full 64-bit range (dedup_extracted keys
    # turns by xxhash64), and 10^12 such labels sum to ~1e31, far past
    # LongType but comfortably inside decimal(38,0)
    def _label_sum(lb):
        return lb.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)"))
        ).collect()[0][0]

    edges = edges.localCheckpoint(eager=True)
    # label-frame checkpoints are LAZY: the convergence probe's own agg
    # materializes them, so each round costs one job, not two (r4)
    labels = (nodes.select(id_col, F.col(id_col).alias("cluster_id"))
              .localCheckpoint(eager=False))
    prev_sum = _label_sum(labels)
    converged = False
    # max_iters + 1 rounds: convergence is only observable one round
    # late (a round that produces no change), so a graph reaching the
    # fixpoint exactly on round max_iters needs one extra verification
    # round — otherwise it would spuriously raise (ADVICE r3). The
    # extra round does no new work at the fixpoint.
    for _ in range(max_iters + 1):
        # (1) neighbor-min propagation
        prop = (edges.join(labels, edges["src"] == labels[id_col])
                .select(F.col("dst").alias(id_col), "cluster_id"))
        labels = (labels.union(prop)
                  .groupBy(id_col)
                  .agg(F.min("cluster_id").alias("cluster_id")))
        # (2) pointer jump: follow the label's own label one step
        parent = labels.select(F.col(id_col).alias("p_id"),
                               F.col("cluster_id").alias("p_label"))
        labels = (labels
                  .join(parent, labels["cluster_id"] == parent["p_id"],
                        "left")
                  .select(id_col,
                          F.least("cluster_id", "p_label")
                          .alias("cluster_id"))
                  .localCheckpoint(eager=False))
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in "
            f"{max_iters + 1} rounds;"
            f" raise max_iters (rounds scale with log(component diameter) "
            f"via pointer jumping, so this indicates a pathological graph)")

    return _cc_finalize(labels, id_col)


def _cc_finalize(labels: DataFrame, id_col: str) -> DataFrame:
    """Shared output contract: (id, cluster_id, cluster_size,
    is_canonical), ordered by id."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("cluster_id")
    return (labels
            .withColumn("cluster_size", F.count("*").over(w))
            .withColumn("is_canonical",
                        F.col(id_col) == F.col("cluster_id"))
            .select(id_col, "cluster_id", "cluster_size", "is_canonical")
            .orderBy(id_col))


def _cc_two_phase(nodes: DataFrame, edges: DataFrame,
                  id_col: str, max_iters: int) -> DataFrame:
    """Large-star/small-star edge contraction (Kiveris et al. 2014,
    Algorithms 3+4). The state is the EDGE set, not a label frame:

      large-star(u): m = min(N(u) + {u}); emit (x, m) for x in N(u),
                     x > u   — strictly-larger neighbors hook onto the
                     neighborhood minimum (keeps every emitted edge
                     oriented hi->lo and provably acyclic),
      small-star(u): over edges oriented (u > v): m = min(N-(u) + {u});
                     emit (x, m) for x in N-(u) + {u}, x != m.

    Alternating the two reaches a fixpoint where the edge set is a
    disjoint union of stars whose centers are the component minima —
    the same fixpoint as min-label propagation, so the DuckDB
    recursive-CTE oracles remain bit-identical. Rounds are
    O(log^2 n) worst-case, O(log n) in practice, and — unlike label
    propagation — a high-degree hub never funnels its whole component
    through one groupBy key round after round: stars contract.

    Convergence probe: (edge count, decimal sums of both endpoints) —
    small-star is monotone in the hooked minima, so a repeated probe
    value means a repeated edge set. Raises like the pointer variant
    on budget exhaustion.

    Returns the label frame (id_col, cluster_id) for _cc_finalize."""
    # orient each undirected edge once as (u=hi, v=lo); drop self loops
    e = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint(eager=False))

    def _probe(df):
        # (count, sum u, sum v, order-independent content checksum).
        # The xxhash64 sum is a set invariant over the DISTINCT edge set:
        # two different edge sets colliding on count+sums+checksum is a
        # ~2^-64 event, unlike the r4 probe (count + coordinate sums)
        # where distinct consecutive edge sets could collide and cause a
        # premature exit with non-fixpoint labels (ADVICE r4).
        r = df.agg(
            F.count(F.lit(1)),
            F.sum(F.col("u").cast("decimal(38,0)")),
            F.sum(F.col("v").cast("decimal(38,0)")),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))).collect()[0]
        return (r[0], r[1], r[2], r[3])

    def _is_star_forest(df):
        # at a true large-star/small-star fixpoint every u keeps exactly
        # one parent edge; a repeated probe value on a non-fixpoint set
        # would fail this structural check and iteration continues
        multi = df.groupBy("u").count().filter(F.col("count") > 1).limit(1)
        return multi.count() == 0

    prev = _probe(e)
    converged = prev[0] == 0  # edgeless graph: all-singleton fixpoint
    for _ in range(max_iters + 1):
        if converged:
            break
        # large-star over the symmetric neighborhood view
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m"))
        e = (sym.join(mins, "u")
             .filter(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .distinct())
        # small-star over the hi->lo orientation (all v < u already)
        mins2 = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (e.join(mins2, "u").select(F.col("v").alias("x"), "m")
             .union(mins2.select(F.col("u").alias("x"), "m"))
             .filter(F.col("x") != F.col("m"))
             .select(F.greatest("x", "m").alias("u"),
                     F.least("x", "m").alias("v"))
             .distinct()
             .localCheckpoint(eager=False))
        cur = _probe(e)
        if cur == prev and _is_star_forest(e):
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in "
            f"{max_iters + 1} rounds; raise max_iters")

    # fixpoint edge set is a star forest: u -> component minimum.
    # min() guards the (convergence-probe-equal but multi-parent)
    # theoretical corner; at a true fixpoint each u has exactly one v.
    centers = e.groupBy("u").agg(F.min("v").alias("cid"))
    return (nodes.select(id_col)
            .join(centers.withColumnRenamed("u", id_col), id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("cid", F.col(id_col)).alias("cluster_id")))


# MinHash: H independent hashes h_j(s) = (a_j * (hash60(s) % MOD) + b_j) % MOD
# 128 pre-generated hash functions; queries slice the first n_hashes so
# demo (8/2) and production (64/16, 128/32) parameterizations share seeds.
MINHASH_MAX = 128
MINHASH_A = _lcg_ints(101, MINHASH_MAX, 1, 2 ** 31)
MINHASH_B = _lcg_ints(202, MINHASH_MAX, 0, 2 ** 31)
# production defaults: r = 64/16 = 4 rows/band =>
# P(candidate | J) = 1 - (1 - J^4)^16: 0.986 at J=0.7, 0.33 at J=0.3 —
# high recall at the near-dup threshold, steep cutoff below it
MINHASH_N_HASHES = 64
MINHASH_N_BANDS = 16

# Random-hyperplane LSH for 64-dim embeddings: 8 planes -> 8-bit bucket
LSH_PLANES = [_lcg_floats(1000 + j, 64) for j in range(8)]

# banded random-hyperplane LSH for the embedding near-dup ops: 4 bands
# of 4 planes each. A pair within cosine 0.95 (theta ~18.2deg) agrees
# with one plane w.p. 1 - theta/pi ~ 0.899, with a 4-plane band w.p.
# 0.899^4 ~ 0.653, and with AT LEAST ONE of 4 bands w.p.
# 1 - (1 - 0.653)^4 ~ 0.986 — vs 0.899^8 ~ 0.43 for a single 8-plane
# band (the r1-r4 shape, replaced after review). Independent seeds from
# LSH_PLANES so the histogram op and the dedup op decorrelate.
LSH_DEDUP_BANDS = 4
LSH_DEDUP_BAND_BITS = 4
LSH_PLANES_DEDUP = [
    _lcg_floats(2000 + j, 64)
    for j in range(LSH_DEDUP_BANDS * LSH_DEDUP_BAND_BITS)]
