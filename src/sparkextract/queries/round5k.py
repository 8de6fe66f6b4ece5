"""Round-5 continuation wave 9: shard-topology change management.

q164 — RENDEZVOUS-HASH REBALANCING AUDIT. Growing a sharded store from
S to S+1 shards moves ~S/(S+1) of all rows under mod-hashing but only
~1/(S+1) under rendezvous/HRW hashing (Thaler & Ravishankar 1998) —
THE argument for consistent placement at 100 TB, made executable: every
doc is placed under both policies at S=8 and S=9 and the audit reports
the moved fraction per policy (hrw ~ 11%, mod ~ 89%).
Determinism: the HRW argmax is encoded as ONE BIGINT — per-candidate
score = first 8 md5 hex digits of 'doc_id|s' (< 2^32, exact in every
engine), key = score * 16 + s, winner = max(key) % 16 — so placement
is a pure-integer map-only array expression with a built-in
deterministic tie-break (higher s wins a score tie), no struct
comparisons, no UDF, no shuffle.
Scale shape: placement is map-only (a 9-element array transform per
row); the verdict is one 2-group map-side-combinable aggregate. At
real scale the same expression IS the repartitioning key, so the audit
and the migration share one scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_Q164_S1 = 8
_Q164_S2 = 9


def _hrw_sql(n: int) -> str:
    # winner = max over s of (score(s) * 16 + s), then % 16
    return (
        "CAST(list_max(list_transform(range(0, "
        f"{n}), s -> CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR) "
        "|| '|' || CAST(s AS VARCHAR)), 1, 8)) AS UBIGINT) * 16 + s)) "
        "% 16 AS BIGINT)"
    )


_Q164_ORACLE = f"""
WITH placed AS (
  SELECT doc_id,
         {_hrw_sql(_Q164_S1)} AS hrw_a,
         {_hrw_sql(_Q164_S2)} AS hrw_b,
         doc_id % {_Q164_S1} AS mod_a,
         doc_id % {_Q164_S2} AS mod_b
  FROM documents
),
expanded AS (
  SELECT 'hrw' AS policy, (hrw_a <> hrw_b) AS moved FROM placed
  UNION ALL
  SELECT 'mod' AS policy, (mod_a <> mod_b) AS moved FROM placed
)
SELECT policy,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       CAST(ROUND(SUM(CASE WHEN moved THEN 1 ELSE 0 END) * 1000000.0
                  / COUNT(*)) AS BIGINT) AS moved_frac_u
FROM expanded GROUP BY policy
"""


def _hrw_col(n: int):
    def key(s):
        score = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        s.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return score * 16 + s

    return (
        F.array_max(F.transform(F.sequence(F.lit(0), F.lit(n - 1)), key)) % 16
    ).cast("long")


@register("q164_rendezvous_rebalance", oracle=_Q164_ORACLE)
def q164_rendezvous_rebalance(spark, sf_dir):
    placed = load(spark, sf_dir, "documents").select(
        "doc_id",
        _hrw_col(_Q164_S1).alias("hrw_a"),
        _hrw_col(_Q164_S2).alias("hrw_b"),
        (F.col("doc_id") % _Q164_S1).alias("mod_a"),
        (F.col("doc_id") % _Q164_S2).alias("mod_b"),
    )
    expanded = placed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hrw").alias("policy"),
                    (F.col("hrw_a") != F.col("hrw_b")).alias("moved"),
                ),
                F.struct(
                    F.lit("mod").alias("policy"),
                    (F.col("mod_a") != F.col("mod_b")).alias("moved"),
                ),
            )
        ).alias("e")
    ).select("e.policy", "e.moved")
    mv = F.when(F.col("moved"), 1).otherwise(0)
    return expanded.groupBy("policy").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(mv).cast("long").alias("n_moved"),
        F.round(F.sum(mv) * F.lit(1000000.0) / F.count("*"))
        .cast("long")
        .alias("moved_frac_u"),
    )
