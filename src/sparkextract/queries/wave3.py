"""Third-wave queries: multimodal binary columns through the driver gate
(q44/q45), an IVF-style ANN variant (q46), and the retrieval filter stack
(q47).

q44/q45 push *binary payloads* through the real ``mapInPandas`` featurize
path (sparkextract.spark.multimodal) — the training-pipeline multimodal
plumbing (schema, Arrow batch shape, decode-stub error handling, dedup
window) — while the DuckDB oracle derives the expected rows in pure SQL
because the stub decoder is deterministic byte math (md5 / sha256).
Reference ancestry: ExtractedImage model + image dedup,
/root/reference/src/image_extractor.py:56-70,676-705 (D2), md5 content
hash /root/reference/src/rag/text_processor.py:534 (D4).

q46 is the IVF scale path for similarity search (vs q27 brute-force and
q28/q34 LSH): assign every vector to its nearest of 8 fixed coarse
centroids (the deterministic stand-in for trained k-means centroids),
probe the query's 2 nearest cells, brute-force only inside them.
Reference ancestry: ivfflat lists=100 index,
/root/reference/src/rag/vector_database.py:184-189 — the reference
delegates IVF to pgvector; here it is explicit DataFrame algebra.

q47 stacks the reference's retrieval-time filters in one pass:
min-chunk-length P4 (text_processor.py:103), confidence threshold P5
(text_processor.py:578-581), similarity floor P8
(vector_database.py:341-343), content-type allowlist P9
(vector_database.py:304-313), meaningful-text predicate P10
(image_extractor.py:635).
"""

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


def _cos_sql(vec: str, other: str) -> str:
    """DuckDB cosine between two FLOAT[] columns, element order fixed."""
    d = f"list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST({vec}[i] AS DOUBLE) * CAST({other}[i] AS DOUBLE)))"
    n1 = f"sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST({vec}[i] AS DOUBLE) * CAST({vec}[i] AS DOUBLE))))"
    n2 = f"sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> CAST({other}[i] AS DOUBLE) * CAST({other}[i] AS DOUBLE))))"
    return f"({d} / ({n1} * {n2}))"


def _media_df(spark, sf_dir, prefix_len: int):
    """Deterministic media table from ``documents``: payload = UTF-8 bytes
    of the first ``prefix_len`` chars; media_type cycles image/audio/video/
    pdf ('pdf' has no decoder → decode_ok=false path exercised)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("pdf")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.substring("text", 1, prefix_len), "utf-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
    )


# --------------------------------------------------------------------------
# q44: binary payload → mapInPandas featurize (stub decoder = sha256 byte
# math). Driver-checks n_bytes, md5 content hash, decode_ok routing AND the
# 16-dim feature itself (as an order-fixed sum, float32-exact both sides).
_Q44_FEATURE_SUM = (
    "list_sum(list_transform(range(0, 16), i -> CAST(CAST(CAST(CONCAT('0x', "
    "substr(sha256(substr(text, 1, 200)), i*2+1, 2)) AS INT) / 255.0 AS FLOAT) AS DOUBLE)))"
)

@register(
    "q44_media_featurize",
    oracle=f"""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           (['image','audio','video','pdf'])[(doc_id % 4) + 1] AS media_type,
           octet_length(encode(substr(text, 1, 200))) AS n_bytes,
           md5(substr(text, 1, 200)) AS content_hash,
           (doc_id % 4) < 3 AS decode_ok,
           CASE WHEN (doc_id % 4) < 3 THEN ROUND({_Q44_FEATURE_SUM}, 6) END AS feature_sum
    FROM documents
    """,
)
def q44_media_featurize(spark, sf_dir):
    from sparkextract.spark.multimodal import featurize_media

    feats = featurize_media(_media_df(spark, sf_dir, 200))
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "content_hash",
        "decode_ok",
        F.round(
            F.aggregate(F.col("feature"), F.lit(0.0), lambda a, x: a + x.cast("double")), 6
        ).alias("feature_sum"),
    )


# --------------------------------------------------------------------------
# q45: media dedup by content hash (D2 window: keep largest payload, then
# lowest media_id). 8-char payload prefixes force real duplicate groups.
@register(
    "q45_media_dedup",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           md5(substr(text, 1, 8)) AS content_hash,
           octet_length(encode(substr(text, 1, 8))) AS n_bytes
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(substr(text, 1, 8))
        ORDER BY octet_length(encode(substr(text, 1, 8))) DESC,
                 CAST(doc_id AS VARCHAR) ASC
    ) = 1
    """,
)
def q45_media_dedup(spark, sf_dir):
    from sparkextract.spark.multimodal import featurize_media, media_dedup

    feats = featurize_media(_media_df(spark, sf_dir, 8))
    return media_dedup(feats).select("media_id", "content_hash", "n_bytes")


# --------------------------------------------------------------------------
# q46: IVF ANN. Scale path: the 8 centroids broadcast to every executor
# (two tiny broadcast nested-loop joins, no shuffle of the vector table);
# assignment + probe filtering happen map-side; the final top-k is a
# TakeOrderedAndProject. At 100 TB the assignment output (vec_id, cell) is
# the only thing materialized; probed cells cut the scored set ~4x here
# (nprobe/2 of 8 cells) and |cells|/nprobe-fold in general.
_Q46_ORACLE = f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND 8
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {_cos_sql('e.embedding', 'c.cv')} AS ccos
      FROM embeddings e, cents c
      WHERE e.vec_id > 8
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY e.vec_id ORDER BY ccos DESC, c.cent_id ASC) = 1
    ),
    qcells AS (
      SELECT c.cent_id FROM cents c, q
      ORDER BY {_cos_sql('q.qv', 'c.cv')} DESC, c.cent_id ASC
      LIMIT 2
    )
    SELECT a.vec_id, a.cent_id AS cell,
           ROUND({_cos_sql('a.embedding', 'q.qv')}, 6) AS cosine
    FROM assign a JOIN qcells USING (cent_id), q
    ORDER BY cosine DESC, a.vec_id ASC
    LIMIT 10
"""

@register("q46_ivf_topk", oracle=_Q46_ORACLE)
def q46_ivf_topk(spark, sf_dir):
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    assign = (
        emb.filter(F.col("vec_id") > 8)
        .crossJoin(F.broadcast(cents))
        .withColumn("ccos", _dot(F.col("embedding"), F.col("cv")) / (_norm(F.col("embedding")) * _norm(F.col("cv"))))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("cell"))
    )
    qcells = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cent_id"))
        .limit(2)
        .select("cent_id")
    )
    return (
        assign.join(F.broadcast(qcells), assign["cell"] == qcells["cent_id"])
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell",
            F.round(
                _dot(F.col("embedding"), F.col("qv")) / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "q48_distinct_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q48_distinct_keys(spark, sf_dir):
    """D3: seen-set dedup by key (reference dedups retrieved chunks by
    chunk_id, /root/reference/src/rag/rag_pipeline.py:514-521) —
    ``dropDuplicates`` restricted to the key columns so the survivor row
    is deterministic. Scale: map-side partial dedup before the shuffle
    (Catalyst plans HashAggregate(partial) → exchange → HashAggregate)."""
    return load(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


# --------------------------------------------------------------------------
# q47: the retrieval filter stack (P4 + P5 + P8 + P9 + P10) in one pass —
# all pushed into the parquet scan as one conjunctive predicate (Catalyst
# collapses the chained filters; only doc_id/lang/n_chars columns are read
# plus text for the P10/overlap terms).
@register(
    "q47_retrieval_filters",
    oracle="""
    SELECT doc_id, lang, n_chars,
           ROUND(LEAST(n_chars / 1000.0, 1.0), 6) AS conf
    FROM documents
    WHERE n_chars >= 100
      AND LEAST(n_chars / 1000.0, 1.0) >= 0.15
      AND lang IN ('en', 'fr')
      AND length(trim(text)) > 3
    """,
)
def q47_retrieval_filters(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    conf = F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
    return (
        docs.filter(F.col("n_chars") >= 100)  # P4
        .filter(conf >= 0.15)  # P5/P8 threshold form
        .filter(F.col("lang").isin("en", "fr"))  # P9
        .filter(F.length(F.trim(F.col("text"))) > 3)  # P10
        .select("doc_id", "lang", "n_chars", F.round(conf, 6).alias("conf"))
    )
