"""Round-5 continuation wave 7: dedup-pipeline governance — split
leakage auditing and quality-aware survivor selection. Both COMPOSE
already-gated operators (q53 pairs, q71 components, q101 split rule,
q38 clusters, q135 classifier) into the audit queries a production
curation pipeline runs after the primitives.

q161 — SPLIT LEAKAGE AUDIT. q101 assigns train/val/test by near-dup
CLUSTER so twins never straddle the eval boundary; this query PROVES
that property and quantifies what the naive policy (split by own id)
would have leaked: for every verified near-dup pair (q53's banded-LSH
candidates, cosine >= 0.8, injected twins included) it derives both
endpoints' splits under BOTH policies and counts pairs whose endpoints
land in different splits. cluster_keyed must report 0 cross-split
pairs (both endpoints of a pair share a q71 component by construction
— the audit is the executable proof); naive_id leaks most twin pairs
(the injected twin id differs, so its md5 bucket is independent).
Scale shape: pairs and components are the (already bounded) dedup
outputs; the component label frame joins twice as a BROADCAST (only
clustered nodes, a tiny fraction of the corpus), the per-policy
expansion is a 2x map-side explode of the PAIR table, and the verdict
is one map-side-combinable groupBy(policy) over 2 groups.

q162 — QUALITY-AWARE SURVIVOR SELECTION. q72 keeps the MIN-id doc per
dup cluster; production dedup keeps the HIGHEST-QUALITY copy (the
mirror may be truncated, the original canonical). Over q38's minhash
clusters (injected-clone corpus), each member is scored with the q135
classifier — the SAME formula, applied to the clone corpus via the
parametrized core — and the survivor is argmax(logit_u) with min-id
tie-break. Output contrasts the min-id keeper (q38's) with the
quality keeper and flags clusters where they differ (the injected
clone mutates the first 10 chars, shifting the logit, so some clusters
genuinely flip). The argmax is computed WITHOUT a cluster-keyed
window: groupBy(max logit) + equi-join back + groupBy(min id) — two
map-side-combinable aggregates, so a viral boilerplate cluster is two
ROWS of partial-agg state, never one task's window partition (the
q96/q99 de-skew rule applied to survivor selection).
Scale shape: signature + score are map-only over the corpus scan
(memoized once); two stacked keyed aggs + one keyed equi-join; output
is cluster-grain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import (
    checkpoint_memo,
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

_Q161_SPLIT_BUCKETS = 10  # q101's rule: 0-7 train, 8 val, 9 test


def _split_case_sql(expr: str) -> str:
    b = md5_bucket_sql(expr, _Q161_SPLIT_BUCKETS)
    return (
        f"CASE WHEN {b} <= 7 THEN 'train' WHEN {b} = 8 THEN 'val' "
        f"ELSE 'test' END"
    )


def _q161_oracle() -> str:
    from sparkextract.queries.dedup2 import _Q53_ORACLE
    from sparkextract.queries.round3 import _Q71_ORACLE

    return f"""
WITH pairs AS (
  SELECT left_id, right_id FROM ({_Q53_ORACLE})
),
comp AS (
  SELECT vec_id, component FROM ({_Q71_ORACLE}) _c
),
keyed AS (
  SELECT p.left_id, p.right_id,
         COALESCE(cl.component, p.left_id) AS cl_l,
         COALESCE(cr.component, p.right_id) AS cl_r
  FROM pairs p
  LEFT JOIN comp cl ON cl.vec_id = p.left_id
  LEFT JOIN comp cr ON cr.vec_id = p.right_id
),
expanded AS (
  SELECT 'cluster_keyed' AS policy,
         {_split_case_sql("cl_l")} AS sl,
         {_split_case_sql("cl_r")} AS sr
  FROM keyed
  UNION ALL
  SELECT 'naive_id' AS policy,
         {_split_case_sql("left_id")} AS sl,
         {_split_case_sql("right_id")} AS sr
  FROM keyed
)
SELECT policy,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN sl <> sr THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
       CAST(ROUND(SUM(CASE WHEN sl <> sr THEN 1 ELSE 0 END) * 1000000.0
                  / COUNT(*)) AS BIGINT) AS cross_frac_u
FROM expanded GROUP BY policy
"""


def _split_name(col):
    b = md5_bucket(col, _Q161_SPLIT_BUCKETS)
    return (
        F.when(b <= 7, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register("q161_split_leakage_audit", oracle=_q161_oracle())
def q161_split_leakage_audit(spark, sf_dir):
    from sparkextract.queries.dedup2 import q53_banded_lsh_near_dup
    from sparkextract.queries.round3 import _dup_components

    pairs = q53_banded_lsh_near_dup(spark, sf_dir).select(
        "left_id", "right_id"
    )
    comp = _dup_components(spark, sf_dir).select(
        F.col("id").alias("c_id"), F.col("lbl").alias("component")
    )
    cl = comp.withColumnRenamed("component", "comp_l")
    cr = comp.withColumnRenamed("component", "comp_r")
    keyed = (
        pairs.join(F.broadcast(cl), pairs["left_id"] == cl["c_id"], "left")
        .drop("c_id")
        .join(F.broadcast(cr), pairs["right_id"] == cr["c_id"], "left")
        .drop("c_id")
        .select(
            "left_id",
            "right_id",
            F.coalesce("comp_l", "left_id").alias("cl_l"),
            F.coalesce("comp_r", "right_id").alias("cl_r"),
        )
    )
    expanded = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("cluster_keyed").alias("policy"),
                    _split_name(F.col("cl_l")).alias("sl"),
                    _split_name(F.col("cl_r")).alias("sr"),
                ),
                F.struct(
                    F.lit("naive_id").alias("policy"),
                    _split_name(F.col("left_id")).alias("sl"),
                    _split_name(F.col("right_id")).alias("sr"),
                ),
            )
        ).alias("e")
    ).select("e.policy", "e.sl", "e.sr")
    cross = F.when(F.col("sl") != F.col("sr"), 1).otherwise(0)
    return expanded.groupBy("policy").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(cross).cast("long").alias("n_cross"),
        F.round(F.sum(cross) * F.lit(1000000.0) / F.count("*"))
        .cast("long")
        .alias("cross_frac_u"),
    )


# --------------------------------------------------------------------------
# q162: quality-aware survivor selection over the q38 clusters

_Q162_NEG = -(10**12)  # logit for members the classifier skips (no tokens)


def _q162_oracle() -> str:
    from sparkextract.queries.round5d import _q135_core_sql

    return f"""
WITH corpus AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, lang,
         'xxxxxxxxxx' || SUBSTRING(text, 11) AS text
  FROM documents WHERE doc_id % 11 = 0
),
feats AS (
  SELECT doc_id, logit_u FROM ({_q135_core_sql("corpus")})
),
sigs AS (
  SELECT doc_id,
         list_min(list_transform(
           range(1, GREATEST(LENGTH(SUBSTRING(text,1,256)) - 7, 1) + 1),
           i -> md5('b0|' || SUBSTRING(SUBSTRING(text,1,256), i, 8)))) AS sig0
  FROM corpus
),
m AS (
  SELECT s.sig0, s.doc_id,
         COALESCE(f.logit_u, {_Q162_NEG}) AS logit_u
  FROM sigs s LEFT JOIN feats f ON f.doc_id = s.doc_id
),
cl AS (
  SELECT sig0, CAST(COUNT(*) AS BIGINT) AS cluster_size,
         CAST(MIN(doc_id) AS BIGINT) AS keeper_min_id,
         CAST(MAX(logit_u) AS BIGINT) AS best_logit_u
  FROM m GROUP BY sig0 HAVING COUNT(*) > 1
),
q AS (
  SELECT m.sig0, CAST(MIN(m.doc_id) AS BIGINT) AS keeper_quality
  FROM m JOIN cl ON m.sig0 = cl.sig0 AND m.logit_u = cl.best_logit_u
  GROUP BY m.sig0
)
SELECT cl.sig0, cl.cluster_size, cl.keeper_min_id, cl.best_logit_u,
       q.keeper_quality,
       (q.keeper_quality <> cl.keeper_min_id) AS differs
FROM cl JOIN q ON q.sig0 = cl.sig0
"""


@register("q162_quality_survivor", oracle=_q162_oracle())
def q162_quality_survivor(spark, sf_dir):
    from sparkextract.queries.round5d import _q135_features_of

    def _build_m():
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        clone = docs.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            "lang",
            F.concat(
                F.lit("xxxxxxxxxx"), F.expr("substring(text, 11)")
            ).alias("text"),
        )
        corpus = docs.unionByName(clone)
        head = F.substring("text", 1, 256)
        n_sh = F.greatest(F.length(head) - 7, F.lit(1))
        sig0 = F.array_min(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.md5(
                    F.concat(F.lit("b0|"), F.substring(head, i, F.lit(8)))
                ),
            )
        )
        sigs = corpus.select("doc_id", sig0.alias("sig0"))
        feats = _q135_features_of(corpus).select("doc_id", "logit_u")
        return sigs.join(feats, "doc_id", "left").select(
            "sig0",
            "doc_id",
            F.coalesce("logit_u", F.lit(_Q162_NEG)).cast("long").alias(
                "logit_u"
            ),
        )

    # the scored member table feeds BOTH the cluster agg and the argmax
    # join-back: materialize once (q87/q125/q159 memo discipline)
    m = checkpoint_memo(spark, sf_dir, "q162_m", _build_m)
    cl = (
        m.groupBy("sig0")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.min("doc_id").cast("long").alias("keeper_min_id"),
            F.max("logit_u").cast("long").alias("best_logit_u"),
        )
        .filter(F.col("cluster_size") > 1)
    )
    q = (
        m.join(
            cl.select("sig0", "best_logit_u"),
            ["sig0"],
        )
        .filter(F.col("logit_u") == F.col("best_logit_u"))
        .groupBy("sig0")
        .agg(F.min("doc_id").cast("long").alias("keeper_quality"))
    )
    return cl.join(q, "sig0").select(
        "sig0",
        "cluster_size",
        "keeper_min_id",
        "best_logit_u",
        "keeper_quality",
        (F.col("keeper_quality") != F.col("keeper_min_id")).alias("differs"),
    )
