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

from sparkextract.queries.base import checkpoint_memo, register
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
