"""Round-5 continuation wave 16: holdout-sample stability and the
hubs/authorities companion of PageRank.

q181 — SAMPLE-CHURN AUDIT (id-keyed vs content-keyed holdout
sampling). An eval holdout carved from a refreshing corpus must be
STABLE: if membership is keyed on a snapshot-dependent value, every
refresh silently rotates the eval set and metric curves stop being
comparable. The audit samples the same two snapshots (the q103-style
old/new pair: one md5 bucket of docs added since, one bucket's text
changed) under two policies — membership by md5 of the immutable
doc_id vs md5 of the text — and measures per-policy churn: the
id-keyed sample loses ZERO surviving members (the executable
stability contract), while the content-keyed sample measurably churns
on every changed doc. The q161 contrast-audit shape applied to eval
governance. Scale: both policies are map-side predicates; the overlap
is one doc_id equi-join on the two sampled sides.

q182 — HITS HUBS/AUTHORITIES, ONE ITERATION (Kleinberg 1999). The
link-analysis companion of q119's PageRank on the SAME deterministic
citation graph: a1(v) = sum of h0 over in-links (h0 uniform), h1(u) =
sum of a1 over out-links, each vector L-infinity-normalized to
micro-units by one broadcast MAX — so every value is BIGINT floor
arithmetic, order-independent and engine-bit-identical (float HITS
would diverge in the last ulp). Verdict: top-10 authorities and
top-10 hubs under a total order. Scale shape: edges are generated
map-side from the scan (fanout 3), the authority step is ONE
dst-keyed shuffle with map-side partial sums, the hub step ONE
src-keyed shuffle — the canonical HITS dataflow; normalization is a
1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import (
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

# --------------------------------------------------------------------------
_Q181_SNAP_BUCKETS = 10  # bucket 0 added since old; bucket 1 changed text
_Q181_SAMPLE_DEN = 5  # 20% holdout

_Q181_OLD = f"""
  SELECT doc_id,
         CASE WHEN {md5_bucket_sql("doc_id", _Q181_SNAP_BUCKETS)} = 1
              THEN 'v0 ' || text ELSE text END AS text
  FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q181_SNAP_BUCKETS)} <> 0
"""

_Q181_ID_PRED = (
    md5_bucket_sql("'s|' || CAST(doc_id AS VARCHAR)", _Q181_SAMPLE_DEN) + " = 0"
)
_Q181_CT_PRED = md5_bucket_sql("text", _Q181_SAMPLE_DEN) + " = 0"


def _q181_policy_sql(tag: str, pred: str) -> str:
    return f"""
  SELECT '{tag}' AS policy,
         CAST(COUNT(o.doc_id) AS BIGINT) AS n_sampled_old,
         CAST(COUNT(n.doc_id) AS BIGINT) AS n_sampled_new,
         CAST(SUM(CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
         CAST(SUM(CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NULL
                        AND o.doc_id IN (SELECT doc_id FROM documents)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_lost_surviving
  FROM (SELECT doc_id FROM old WHERE {pred}) o
  FULL OUTER JOIN (SELECT doc_id FROM documents WHERE {pred}) n
    ON n.doc_id = o.doc_id
"""


_Q181_ORACLE = f"""
WITH old AS (
  {_Q181_OLD}
)
SELECT policy, n_sampled_old, n_sampled_new, n_overlap, n_lost_surviving,
       CASE WHEN n_sampled_old = 0 THEN CAST(0 AS BIGINT)
            ELSE (1000000 * (n_sampled_old - n_overlap)) // n_sampled_old
       END AS churn_u
FROM (
  {_q181_policy_sql("id_keyed", _Q181_ID_PRED)}
  UNION ALL
  {_q181_policy_sql("content_keyed", _Q181_CT_PRED)}
)
"""


@register("q181_sample_churn_audit", oracle=_Q181_ORACLE)
def q181_sample_churn_audit(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    snap = md5_bucket(F.col("doc_id"), _Q181_SNAP_BUCKETS)
    old = docs.where(snap != 0).select(
        "doc_id",
        F.when(snap == 1, F.concat(F.lit("v0 "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    id_pred = (
        md5_bucket(
            F.concat(F.lit("s|"), F.col("doc_id").cast("string")),
            _Q181_SAMPLE_DEN,
        )
        == 0
    )
    ct_pred = md5_bucket(F.col("text"), _Q181_SAMPLE_DEN) == 0
    new_ids = docs.select("doc_id")
    frames = []
    for tag, pred in [("id_keyed", id_pred), ("content_keyed", ct_pred)]:
        so = old.where(pred).select(F.col("doc_id").alias("o_id"))
        sn = docs.where(pred).select(F.col("doc_id").alias("n_id"))
        joined = so.join(sn, F.col("o_id") == F.col("n_id"), "full_outer")
        # a sampled-old doc that left the sample but still exists in the
        # new snapshot = silent eval-set rotation (the failure mode)
        surv = joined.join(
            new_ids.select(F.col("doc_id").alias("s_id")),
            F.col("o_id") == F.col("s_id"),
            "left",
        )
        frames.append(
            surv.agg(
                F.lit(tag).alias("policy"),
                F.count("o_id").cast("long").alias("n_sampled_old"),
                F.count("n_id").cast("long").alias("n_sampled_new"),
                F.sum(
                    F.when(
                        F.col("o_id").isNotNull() & F.col("n_id").isNotNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_overlap"),
                F.sum(
                    F.when(
                        F.col("o_id").isNotNull()
                        & F.col("n_id").isNull()
                        & F.col("s_id").isNotNull(),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_lost_surviving"),
            )
        )
    out = frames[0].unionByName(frames[1])
    return out.select(
        "policy",
        "n_sampled_old",
        "n_sampled_new",
        "n_overlap",
        "n_lost_surviving",
        F.when(F.col("n_sampled_old") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "(1000000 * (n_sampled_old - n_overlap)) div n_sampled_old"
            )
        )
        .alias("churn_u"),
    )


# --------------------------------------------------------------------------
_Q182_FANOUT = 3
_Q182_TOPK = 10
_Q182_UNIT = 1_000_000


def _q182_cite_sql(j: int) -> str:
    return (
        f"CAST(CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR) || '#{j}'),"
        f" 1, 8)) AS UBIGINT) % n.n_docs AS BIGINT)"
    )


def _q182_oracle() -> str:
    edges_sel = " UNION ALL ".join(
        f"SELECT doc_id AS src, {_q182_cite_sql(j)} AS dst FROM documents, n"
        for j in range(_Q182_FANOUT)
    )
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
edges0 AS ({edges_sel}),
edges AS (SELECT src, dst FROM edges0 WHERE src <> dst),
a1 AS (
  SELECT dst AS doc_id, CAST({_Q182_UNIT} AS BIGINT) * COUNT(*) AS raw
  FROM edges GROUP BY dst
),
amax AS (SELECT MAX(raw) AS mx FROM a1),
an AS (
  SELECT doc_id, (raw * {_Q182_UNIT}) // amax.mx AS score_u
  FROM a1, amax
),
h1 AS (
  SELECT e.src AS doc_id, CAST(SUM(an.score_u) AS BIGINT) AS raw
  FROM edges e JOIN an ON an.doc_id = e.dst
  GROUP BY e.src
),
hmax AS (SELECT MAX(raw) AS mx FROM h1),
hn AS (
  SELECT doc_id, (raw * {_Q182_UNIT}) // hmax.mx AS score_u
  FROM h1, hmax
),
top_a AS (
  SELECT 'authority' AS role, CAST(rn AS BIGINT) AS rnk, doc_id, score_u
  FROM (SELECT doc_id, score_u,
               ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS rn
        FROM an)
  WHERE rn <= {_Q182_TOPK}
),
top_h AS (
  SELECT 'hub' AS role, CAST(rn AS BIGINT) AS rnk, doc_id, score_u
  FROM (SELECT doc_id, score_u,
               ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS rn
        FROM hn)
  WHERE rn <= {_Q182_TOPK}
)
SELECT * FROM top_a UNION ALL SELECT * FROM top_h
"""


@register("q182_hits_hubs_authorities", oracle=_q182_oracle())
def q182_hits_hubs_authorities(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    with_n = docs.crossJoin(F.broadcast(n_docs))
    cites = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"#{j}"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("n_docs")
        ).alias(f"c{j}")
        for j in range(_Q182_FANOUT)
    ]
    edges = (
        with_n.select("doc_id", F.explode(F.array(*cites)).alias("dst"))
        .where(F.col("doc_id") != F.col("dst"))
        .select(F.col("doc_id").alias("src"), "dst")
    )
    a1 = edges.groupBy("dst").agg(
        (F.lit(_Q182_UNIT) * F.count("*")).cast("long").alias("raw")
    )
    amax = a1.agg(F.max("raw").alias("mx"))
    an = a1.crossJoin(F.broadcast(amax)).select(
        F.col("dst").alias("doc_id"),
        F.expr(f"(raw * {_Q182_UNIT}) div mx").alias("score_u"),
    )
    h1 = (
        edges.join(
            an.select(F.col("doc_id").alias("dst"), "score_u"), "dst"
        )
        .groupBy("src")
        .agg(F.sum("score_u").cast("long").alias("raw"))
    )
    hmax = h1.agg(F.max("raw").alias("mx"))
    hn = h1.crossJoin(F.broadcast(hmax)).select(
        F.col("src").alias("doc_id"),
        F.expr(f"(raw * {_Q182_UNIT}) div mx").alias("score_u"),
    )

    def topk(df, role):
        w = Window.orderBy(F.desc("score_u"), F.asc("doc_id"))
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _Q182_TOPK)
            .select(
                F.lit(role).alias("role"),
                F.col("rn").cast("long").alias("rnk"),
                "doc_id",
                "score_u",
            )
        )

    return topk(an, "authority").unionByName(topk(hn, "hub"))
