"""Round-5 continuation wave 10: alternating-algorithm connected
components.

q165 — TWO-PHASE (LARGE-STAR / SMALL-STAR) CONNECTED COMPONENTS
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) over the q68 simhash near-dup pair set. q71's min-label
propagation needs O(graph diameter) rounds — fine for near-dup
blobs (tiny diameters), pathological for chain-shaped duplicate
graphs (doc A ~ B ~ C ~ ... across a crawl). Two-phase converges in
O(log^2 n) rounds REGARDLESS of diameter, which is the algorithm
you actually run on a 10^12-doc web graph. Both algorithms reach
the identical min-label fixed point, so the recursive-CTE oracle
verifies this implementation exactly, and a pytest proves the
round-count advantage on a synthetic 200-node chain.

Per round, each star operation is: one symmetrize (union), one
map-side-combinable ``groupBy(node).agg(min)`` (label-sized rows),
one join of edges against that min table, one distinct. Lineage is
cut per round with ``localCheckpoint`` (the q71 discipline), the
round count is bounded with a loud failure, and the edge set only
ever carries (node, smaller-label) pairs — monotone shrinking
toward the star fixed point. Reference parity: the reference
deduplicates via pairwise similarity only
(``/root/reference/src/table_comparator.py``); transitive closure
is the scale extension its users need on a real corpus.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkextract.queries.base import checkpoint_memo, md5_bucket_sql, register
from sparkextract.queries.dedup2 import (
    _Q68_CORPUS,
    q68_simhash_near_dup,
    simhash_pairs_sql,
)

_Q165_MAX_ROUNDS = 40


def two_phase_cc(pair_df, max_rounds: int = _Q165_MAX_ROUNDS):
    """(left_id, right_id) dup pairs -> (id, lbl) component labels via
    alternating large-star / small-star rounds. Converges in O(log^2 n)
    rounds independent of graph diameter; every intermediate edge is
    (node, strictly-smaller label). Raises loudly if the bound is hit
    (the bound covers n ~ 2^40 at the proven round complexity)."""
    # self-pairs carry no connectivity and would otherwise vanish from
    # the shrinking edge set mid-loop; production pair sources are
    # strict (left < right), so dropping them up front is a no-op there
    edges = (
        pair_df.select(
            F.greatest("left_id", "right_id").alias("a"),
            F.least("left_id", "right_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # large-star: every node u links its LARGER neighbors to
        # min(N(u) + {u}); processing both orientations covers each edge
        # from both endpoints.
        und = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = und.groupBy("a").agg(F.min("b").alias("mn")).select(
            "a", F.least("a", "mn").alias("m")
        )
        ls = (
            und.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # small-star: edges are now (larger, smaller); every node links
        # its smaller neighbors AND itself to min(N(u) + {u}) = min(N(u)).
        lo_min = ls.groupBy("a").agg(F.min("b").alias("m"))
        nxt = (
            ls.join(lo_min, "a")
            .select(F.col("b").alias("v"), "m")
            .where(F.col("v") != F.col("m"))
            .unionByName(lo_min.select(F.col("a").alias("v"), "m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint()
        )
        converged = (
            nxt.count() == edges.count() and nxt.exceptAll(edges).count() == 0
        )
        edges = nxt
        if converged:
            break
    else:
        raise RuntimeError(
            f"two-phase CC did not converge in {max_rounds} rounds"
        )
    # fixed point is a forest of stars (member -> component min): labels
    # are the edges themselves plus each center labeling itself.
    return (
        edges.select(F.col("a").alias("id"), F.col("b").alias("lbl"))
        .unionByName(edges.select(F.col("b").alias("id"), F.col("b").alias("lbl")))
        .groupBy("id")
        .agg(F.min("lbl").alias("lbl"))
    )


_Q165_ORACLE = f"""
WITH RECURSIVE {simhash_pairs_sql(_Q68_CORPUS)},
edges AS (
  SELECT left_id AS a, right_id AS b FROM dup_pairs
  UNION ALL
  SELECT right_id, left_id FROM dup_pairs
),
cc_nodes AS (SELECT DISTINCT a AS id FROM edges),
reach AS (
  SELECT id, id AS lbl FROM cc_nodes
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id
)
SELECT doc_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM (
  SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id
)
"""


@register("q165_two_phase_cc", oracle=_Q165_ORACLE)
def q165_two_phase_cc(spark, sf_dir):
    labels = checkpoint_memo(
        spark,
        sf_dir,
        "q165_two_phase_cc",
        lambda: two_phase_cc(q68_simhash_near_dup(spark, sf_dir)),
    )
    w = F.count("*").over(Window.partitionBy("lbl"))
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("component"),
        w.alias("cluster_size"),
    )


# --------------------------------------------------------------------------
# q166 — JOHNSON-LINDENSTRAUSS PROJECTION DISTORTION AUDIT. The scale
# path for embedding work at 10^12 docs is to run candidate generation
# in a k << d sketch space (sign random projection, Achlioptas 2003):
# a map-only transform whose distance distortion the JL lemma bounds.
# This audit makes the bound executable: every vector is projected
# d=64 -> k=16 with a fixed +-1 sign matrix (md5-parity derived, so
# both engines build the identical matrix), a deterministic
# md5-bucketed pair sample is scored with ratio = ||S(a-b)||^2 /
# (k * ||a-b||^2), and the output is the distortion histogram
# (JL predicts concentration around 1 with std ~ sqrt(2/k)).
# Scale shape: projection is map-only; the pair sample is two tiny
# md5 buckets (a broadcast cross of samples, never corpus all-pairs);
# the verdict is one map-side-combinable grouped aggregate.
# Numeric discipline: all element math in DOUBLE with sequential
# list folds on both engines, final ratios ROUND(..., 6), decimal-cast
# sums for the mean (base.py discipline).

_Q166_K = 16
_Q166_D = 64


def _jl_signs() -> list[list[float]]:
    """k x d +-1 matrix from md5 parity — identical in both engines and
    across processes (no RNG)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(_Q166_D)
        ]
        for j in range(_Q166_K)
    ]


def _q166_oracle() -> str:
    signs = _jl_signs()
    proj = ", ".join(
        "list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(str(s) for s in row)
        + f"]) AS p{j}"
        for j, row in enumerate(signs)
    )
    proj_d2 = " + ".join(
        f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(_Q166_K)
    )
    return f"""
WITH proj AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {proj}
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS left_id, b.vec_id AS right_id,
         list_sum(list_transform(range(1, {_Q166_D + 1}),
                  i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS orig_d2,
         {proj_d2} AS proj_d2
  FROM proj a, proj b
  WHERE {md5_bucket_sql('a.vec_id', 16)} = 0
    AND {md5_bucket_sql('b.vec_id', 16)} = 1
),
scored AS (
  SELECT ROUND(proj_d2 / ({_Q166_K} * orig_d2), 6) AS ratio
  FROM pairs WHERE orig_d2 > 0
)
SELECT CAST(LEAST(GREATEST(FLOOR(ratio * 10), 0), 19) AS BIGINT) AS ratio_bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_ratio,
       MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio
FROM scored GROUP BY 1
"""


def _jl_project(vec_col):
    """array<float> -> array<double> of k signed projections; a pure
    map-only expression (the sign matrix is a folded literal)."""
    signs = _jl_signs()
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(s) for s in signs[j]]),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for j in range(_Q166_K)
        ]
    )


@register("q166_jl_distortion", oracle=_q166_oracle())
def q166_jl_distortion(spark, sf_dir):
    from sparkextract.queries.base import load, md5_bucket

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        _jl_project(F.col("embedding")).alias("p"),
    )
    a = emb.filter(md5_bucket(F.col("vec_id"), 16) == 0).select(
        F.col("vec_id").alias("left_id"), F.col("v").alias("av"), F.col("p").alias("ap")
    )
    b = emb.filter(md5_bucket(F.col("vec_id"), 16) == 1).select(
        F.col("vec_id").alias("right_id"),
        F.col("v").alias("bv"),
        F.col("p").alias("bp"),
    )
    sq = lambda c: c * c  # noqa: E731
    pairs = a.crossJoin(F.broadcast(b)).select(
        F.aggregate(
            F.zip_with("av", "bv", lambda x, y: sq(x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("orig_d2"),
        F.aggregate(
            F.zip_with("ap", "bp", lambda x, y: sq(x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("proj_d2"),
    )
    scored = pairs.filter(F.col("orig_d2") > 0).select(
        F.round(F.col("proj_d2") / (_Q166_K * F.col("orig_d2")), 6).alias("ratio")
    )
    bin_ = F.least(
        F.greatest(F.floor(F.col("ratio") * 10), F.lit(0)), F.lit(19)
    ).cast("long")
    return scored.groupBy(bin_.alias("ratio_bin")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        (
            F.sum(F.col("ratio").cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
    )
