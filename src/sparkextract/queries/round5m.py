"""Round-5 continuation wave 11: skew telemetry + truncated-embedding
retrieval.

q167 — SHUFFLE-PARTITION SKEW AUDIT (hash vs salted keys). The single
biggest 100 TB failure mode is a shuffle keyed on a hot column:
``events.event_type`` has 5 values, so hash partitioning into 32 tasks
leaves >= 27 idle and one task per hot key. Salting (key || salt,
16 salts) is the standard fix. This audit makes the decision
measurable: every row is bucketed under both policies and the verdict
reports, per policy, empty-task count, max task load, max/mean
imbalance and the Gini coefficient of the task-load distribution —
the exact telemetry a shuffle planner needs before picking a salt
factor. Pure integer math end-to-end (md5-derived buckets, rank-form
Gini), so the oracle match is exact by construction.

q168 — MATRYOSHKA TRUNCATION RECALL AUDIT. Matryoshka-style
representations (Kusupati et al. 2022) let a pipeline run ANN
candidate generation on a PREFIX of each embedding (here 16 of 64
dims) at 4x less memory bandwidth. The audit measures what that
truncation costs: for an md5-sampled query set, top-10 by full-dim
cosine vs top-10 by prefix cosine, reporting per-query overlap and
recall. Scale shape: the query side is a broadcast (tiny sample), the
corpus is scanned once, ranking is two per-query windows over the
scored frame — never an all-pairs corpus join. Cosines are rounded to
6 before ranking with a vec_id tie-break, so both engines rank
identically (q27 discipline).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkextract.queries.base import (
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

_Q167_B = 32
_Q167_SALTS = 16

_Q167_ORACLE = f"""
WITH tagged AS (
  SELECT 'hash' AS policy,
         CAST({md5_bucket_sql('event_type', _Q167_B)} AS BIGINT) AS bucket
  FROM events
  UNION ALL
  SELECT 'salted' AS policy,
         CAST({md5_bucket_sql(
             "event_type || '|' || CAST(event_id % " + str(_Q167_SALTS) + " AS VARCHAR)",
             _Q167_B,
         )} AS BIGINT) AS bucket
  FROM events
),
scaffold AS (
  SELECT p.policy, CAST(r.range AS BIGINT) AS bucket
  FROM (SELECT UNNEST(['hash', 'salted']) AS policy) p, range(0, {_Q167_B}) r
),
counts AS (
  SELECT policy, bucket, COUNT(*) AS n FROM tagged GROUP BY 1, 2
),
filled AS (
  SELECT s.policy, s.bucket, COALESCE(c.n, 0) AS n_rows
  FROM scaffold s LEFT JOIN counts c
    ON c.policy = s.policy AND c.bucket = s.bucket
),
ranked AS (
  SELECT policy, n_rows,
         ROW_NUMBER() OVER (PARTITION BY policy ORDER BY n_rows, bucket) AS i
  FROM filled
)
SELECT policy,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN n_rows = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       CAST(MAX(n_rows) AS BIGINT) AS max_rows,
       CAST(ROUND(MAX(n_rows) * 1000000.0 * {_Q167_B} / SUM(n_rows)) AS BIGINT)
         AS imbalance_u,
       CAST(ROUND((2 * SUM(i * n_rows) - {_Q167_B + 1} * SUM(n_rows))
                  * 1000000.0 / ({_Q167_B} * SUM(n_rows))) AS BIGINT) AS gini_u
FROM ranked GROUP BY policy
"""


@register("q167_partition_skew_audit", oracle=_Q167_ORACLE)
def q167_partition_skew_audit(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "event_id")
    salted_key = F.concat(
        F.col("event_type"),
        F.lit("|"),
        (F.col("event_id") % _Q167_SALTS).cast("string"),
    )
    tagged = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hash").alias("policy"),
                    md5_bucket(F.col("event_type"), _Q167_B).alias("bucket"),
                ),
                F.struct(
                    F.lit("salted").alias("policy"),
                    md5_bucket(salted_key, _Q167_B).alias("bucket"),
                ),
            )
        ).alias("e")
    ).select("e.policy", "e.bucket")
    counts = tagged.groupBy("policy", "bucket").agg(F.count("*").alias("n"))
    scaffold = spark.range(_Q167_B).select(
        F.col("id").cast("long").alias("bucket"),
        F.explode(F.array(F.lit("hash"), F.lit("salted"))).alias("policy"),
    )
    filled = scaffold.join(counts, ["policy", "bucket"], "left").select(
        "policy", "bucket", F.coalesce("n", F.lit(0)).alias("n_rows")
    )
    w = Window.partitionBy("policy").orderBy("n_rows", "bucket")
    ranked = filled.select(
        "policy", "n_rows", F.row_number().over(w).alias("i")
    )
    return ranked.groupBy("policy").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("n_rows") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
        F.max("n_rows").cast("long").alias("max_rows"),
        F.round(F.max("n_rows") * F.lit(1000000.0) * _Q167_B / F.sum("n_rows"))
        .cast("long")
        .alias("imbalance_u"),
        F.round(
            (
                2 * F.sum(F.col("i") * F.col("n_rows"))
                - (_Q167_B + 1) * F.sum("n_rows")
            )
            * F.lit(1000000.0)
            / (_Q167_B * F.sum("n_rows"))
        )
        .cast("long")
        .alias("gini_u"),
    )


# --------------------------------------------------------------------------
_Q168_PREFIX = 16
_Q168_TOPK = 10
_Q168_QBUCKETS = 50  # md5_bucket(vec_id, 50) == 0 -> ~2% query sample


def _duck_cos(av: str, bv: str) -> str:
    return (
        f"ROUND(list_dot_product({av}, {bv}) / "
        f"(SQRT(list_dot_product({av}, {av})) * SQRT(list_dot_product({bv}, {bv}))), 6)"
    )


_Q168_ORACLE = f"""
WITH qset AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
         CAST(embedding[1:{_Q168_PREFIX}] AS DOUBLE[]) AS qvt
  FROM embeddings
  WHERE {md5_bucket_sql('vec_id', _Q168_QBUCKETS)} = 0
),
scored AS (
  SELECT q.qid, c.vec_id,
         {_duck_cos('CAST(c.embedding AS DOUBLE[])', 'q.qv')} AS cos_full,
         {_duck_cos(f'CAST(c.embedding[1:{_Q168_PREFIX}] AS DOUBLE[])', 'q.qvt')}
           AS cos_trunc
  FROM embeddings c, qset q
  WHERE c.vec_id <> q.qid
),
full_top AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_full DESC, vec_id) AS rn
    FROM scored
  ) WHERE rn <= {_Q168_TOPK}
),
trunc_top AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_trunc DESC, vec_id) AS rn
    FROM scored
  ) WHERE rn <= {_Q168_TOPK}
)
SELECT f.qid AS query_id,
       CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
       CAST(ROUND(COUNT(t.vec_id) * 1000000.0 / {_Q168_TOPK}) AS BIGINT)
         AS recall_u
FROM full_top f
LEFT JOIN trunc_top t ON t.qid = f.qid AND t.vec_id = f.vec_id
GROUP BY f.qid
"""


def _dot_cols(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cos_cols(a, b):
    return F.round(
        _dot_cols(a, b) / (F.sqrt(_dot_cols(a, a)) * F.sqrt(_dot_cols(b, b))), 6
    )


@register("q168_matryoshka_recall", oracle=_Q168_ORACLE)
def q168_matryoshka_recall(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qset = emb.filter(md5_bucket(F.col("vec_id"), _Q168_QBUCKETS) == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.slice("v", 1, _Q168_PREFIX).alias("qvt"),
    )
    scored = (
        emb.crossJoin(F.broadcast(qset))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            _cos_cols(F.col("v"), F.col("qv")).alias("cos_full"),
            _cos_cols(F.slice("v", 1, _Q168_PREFIX), F.col("qvt")).alias(
                "cos_trunc"
            ),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cos_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.desc("cos_trunc"), F.asc("vec_id"))
    full_top = (
        scored.select("qid", "vec_id", F.row_number().over(wf).alias("rn"))
        .where(F.col("rn") <= _Q168_TOPK)
        .drop("rn")
    )
    trunc_top = (
        scored.select("qid", "vec_id", F.row_number().over(wt).alias("rn"))
        .where(F.col("rn") <= _Q168_TOPK)
        .drop("rn")
        .withColumnRenamed("vec_id", "t_vec_id")
    )
    joined = full_top.join(
        trunc_top,
        (full_top["qid"] == trunc_top["qid"])
        & (full_top["vec_id"] == trunc_top["t_vec_id"]),
        "left",
    ).select(full_top["qid"], trunc_top["t_vec_id"])
    return joined.groupBy(F.col("qid").alias("query_id")).agg(
        F.count("t_vec_id").cast("long").alias("n_overlap"),
        F.round(F.count("t_vec_id") * F.lit(1000000.0) / _Q168_TOPK)
        .cast("long")
        .alias("recall_u"),
    )
