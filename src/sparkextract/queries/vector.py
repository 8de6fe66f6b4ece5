"""Embedding-column operators (F11/T1 + training-pipeline ANN baseline):
brute-force cosine top-k, LSH-bucketed candidate generation, embedding
quality stats (A8).

Double-precision folds over the embedding arrays are evaluated in element
order by both engines; results are rounded to 6 decimals before compare
(error margin ~1e-13 ≪ 5e-7 rounding quantum)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


# --------------------------------------------------------------------------
# T1/J3: brute-force cosine top-k against the vec_id=0 query vector.
# Scale path: broadcast the query vector (a 1-row dim-64 array), score every
# row map-side, TakeOrderedAndProject for the global top-k — no shuffle of
# the embedding table.
@register(
    "q27_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND(
             list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
             / ( sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ),
             6) AS cosine
    FROM embeddings e, q
    WHERE vec_id != 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
)
def q27_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                _dot(F.col("embedding"), F.col("qv"))
                / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


# --------------------------------------------------------------------------
# LSH-bucketed ANN candidate generation: sign of the projection onto 4
# deterministic pseudo-random hyperplanes → 4-bit bucket; report bucket
# occupancy. The scale path for similarity search: equi-join on bucket
# instead of a cross join. Hyperplane components are ±1 derived from md5
# parity (NOT each engine's hash() builtin, which differs between Spark
# and DuckDB), so both engines compute identical signs.
def _plane_sign_sql(i_expr: str, plane: int) -> str:
    # parity of first hex digit of md5("<plane>:<i>") — engine-independent
    return (
        f"(CASE WHEN STRPOS('02468ace', SUBSTRING(md5('{plane}:' || CAST({i_expr} AS VARCHAR)), 1, 1)) > 0 "
        f"THEN 1.0 ELSE -1.0 END)"
    )


_Q28_ORACLE = f"""
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
FROM (
  SELECT vec_id, CAST(
    {" + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {_DIM + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * {_plane_sign_sql('i', p)})) >= 0 THEN {1 << (3 - p)} ELSE 0 END)"
        for p in range(4)
    )}
    AS INTEGER) AS bucket
  FROM embeddings
) GROUP BY bucket
"""


def _plane_signs_py(plane: int) -> list[float]:
    # driver-side evaluation of the same md5-parity rule the oracle
    # computes inline: hashlib md5 == engine md5, byte for byte, so the
    # signs are a CONSTANT matrix — embedding it as one nested-array
    # literal replaces 4x64 per-ROW md5 calls with zero (the hyperplane
    # is a function of (plane, i) only; recomputing it per row is pure
    # waste at any scale, and at 100 TB it is 256 hashes per vector)
    import hashlib

    return [
        1.0 if hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[0] in "02468ace" else -1.0
        for i in range(1, _DIM + 1)
    ]


def q28_lsh_buckets(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")

    def plane_proj(p: int):
        signs = F.lit(_plane_signs_py(p))
        return F.aggregate(
            F.zip_with(F.col("embedding"), signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = F.lit(0)
    for p in range(4):
        proj = plane_proj(p)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << (3 - p))).otherwise(F.lit(0))
    return (
        emb.select("vec_id", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


from sparkextract.queries.base import ORACLE_SQL, SPARK_QUERIES  # noqa: E402

SPARK_QUERIES["q28_lsh_buckets"] = q28_lsh_buckets
ORACLE_SQL["q28_lsh_buckets"] = _Q28_ORACLE


# --------------------------------------------------------------------------
# A8: embedding quality stats — L2 norm bounds + zero-component counts.
@register(
    "q31_embedding_quality",
    oracle=f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CAST(ROUND(sqrt(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_l2,
           CAST(SUM(LENGTH(list_filter(embedding, x -> x = 0))) AS BIGINT) AS n_zero_components
    FROM embeddings GROUP BY label
    """,
)
def q31_embedding_quality(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    l2 = F.round(_norm(F.col("embedding")), 6).cast("decimal(18,6)")
    zeros = F.size(F.filter("embedding", lambda x: x == 0))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        (F.sum(l2).cast("double") / F.count("*")).alias("avg_l2"),
        F.sum(zeros).alias("n_zero_components"),
    )
