"""Second-wave dedup operators: SimHash and LSH-bucketed embedding
near-dup join — the remaining training-data-pipeline dedup family
(exact ✓ q11/q13, MinHash ✓ q19, Jaccard ✓ q20, fingerprint ✓ q21).

SimHash here is a 16-bit signature: for each whitespace token, md5 gives
16 pseudo-random bits (first 4 hex chars); each bit position accumulates
+1/-1 over tokens; the sign per position forms the signature. Pure
integer/md5 math → identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_BITS = 16


def _simhash_oracle() -> str:
    # per-bit: sum over distinct tokens of (bit?1:-1), bit b of the 16-bit
    # value = first 4 hex chars of md5(token)
    bit_terms = " + ".join(
        f"(CASE WHEN (v >> {b}) & 1 = 1 THEN (1 << {b}) ELSE 0 END)" for b in range(_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ), bits AS (
      SELECT doc_id,
             CAST(('0x' || SUBSTRING(md5(tok), 1, 4))::VARCHAR AS UBIGINT) AS hv
      FROM toks WHERE tok != ''
    ), votes AS (
      SELECT doc_id, {", ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(_BITS)
      )}
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN s{b} > 0 THEN (1 << {b}) ELSE 0 END)" for b in range(_BITS))} AS BIGINT) AS simhash
    FROM votes
    """


@register("q32_simhash", oracle=_simhash_oracle())
def q32_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).filter(F.col("tok") != "")
    hv = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
    bits = toks.select("doc_id", hv.alias("hv"))
    votes = bits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("hv", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_BITS)
        ]
    )
    sig = None
    for b in range(_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


# --------------------------------------------------------------------------
# Embedding near-dup candidates via LSH-bucket equi-join + exact cosine
# verify — the scale pattern for similarity dedup: candidates come from a
# bucket hash join (shuffle on a tiny int key), never a cross join; the
# exact cosine runs only on co-bucketed pairs.
_DIM = 64


def _plane_sign_sql(i_expr: str, plane: int) -> str:
    return (
        f"(CASE WHEN STRPOS('02468ace', SUBSTRING(md5('{plane}:' || CAST({i_expr} AS VARCHAR)), 1, 1)) > 0 "
        f"THEN 1.0 ELSE -1.0 END)"
    )


def _bucket_sql(emb: str) -> str:
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {_DIM + 1}), "
        f"i -> CAST({emb}[i] AS DOUBLE) * {_plane_sign_sql('i', p)})) >= 0 THEN {1 << (3 - p)} ELSE 0 END)"
        for p in range(4)
    )


_Q34_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({_bucket_sql('embedding')} AS INTEGER) AS bucket
  FROM embeddings WHERE vec_id < 300
)
SELECT x.vec_id AS left_id, y.vec_id AS right_id,
       ROUND(
         list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
         / ( sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))) ),
         6) AS cosine
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE ROUND(
         list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
         / ( sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))) ),
         6) >= 0.3
"""


def _plane_sign_spark(i, plane: int):
    first_hex = F.substring(F.md5(F.concat(F.lit(f"{plane}:"), i.cast("string"))), 1, 1)
    return F.when(first_hex.isin(*list("02468ace")), F.lit(1.0)).otherwise(F.lit(-1.0))


def _bucket_col():
    def plane_proj(p: int):
        def mul(x, i):
            return x.cast("double") * _plane_sign_spark(i, p)

        return F.aggregate(
            F.zip_with(F.col("embedding"), F.sequence(F.lit(1), F.lit(_DIM)), mul),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = F.lit(0)
    for p in range(4):
        bucket = bucket + F.when(plane_proj(p) >= 0, F.lit(1 << (3 - p))).otherwise(F.lit(0))
    return bucket.cast("int")


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


@register("q34_lsh_near_dup_join", oracle=_Q34_ORACLE)
def q34_lsh_near_dup_join(spark, sf_dir):
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding", _bucket_col().alias("bucket"))
    )
    x = emb.alias("x")
    y = emb.alias("y")
    pairs = x.join(
        y,
        (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vec_id") < F.col("y.vec_id")),
    )
    cosine = F.round(
        _dot(F.col("x.embedding"), F.col("y.embedding"))
        / (_norm(F.col("x.embedding")) * _norm(F.col("y.embedding"))),
        6,
    )
    return pairs.select(
        F.col("x.vec_id").alias("left_id"),
        F.col("y.vec_id").alias("right_id"),
        cosine.alias("cosine"),
    ).filter(F.col("cosine") >= 0.3)
