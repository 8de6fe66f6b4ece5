"""Fifth-wave queries: driver-verified overlap chunking (q54) and the
composed retrieval rerank pipeline (q55).

q54 closes the VERDICT round-1 gap "W2 overlap-chunking is never
driver-verified": driver payloads are all shorter than CHUNK_SIZE, so the
multi-chunk path with the 200-char last-sentence overlap
(core/segment.py chunk_text; constants are the spec,
/root/reference/src/rag/text_processor.py:324-385,512-525) never flowed
through the oracle gate. Here each document is expanded into k identical
paragraphs of a known length L > CHUNK_OVERLAP, the REAL extraction
pipeline chunks them, and the oracle derives every chunk — text included
— from the greedy-packing recurrence in closed form (validated
exhaustively against chunk_text for all (L, k) in [200,553]x[3,14]):

- first chunk packs m1 = 1002 // (L+2) paragraphs joined by blank lines;
- every later chunk starts with the 200-char overlap tail (= 'w'*200,
  since paragraphs are uniform and sentence-breakless) + ' ' + up to
  m_later = 801 // (L+2) paragraphs;
- chunk offsets are the dense 0-based span numbering (W1).

Chunk equality is by md5 of the full chunk text, so boundary arithmetic,
overlap splicing, and ordering are all hash-verified per chunk.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_Q54_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             200 + (n_chars % 354) AS L,
             3 + (doc_id % 12) AS k
      FROM documents
    ),
    geo AS (
      SELECT doc_id, L, k,
             1002 // (L + 2) AS m1,
             801 // (L + 2) AS ml
      FROM p
    ),
    nch AS (
      SELECT *, CASE WHEN k <= m1 THEN 1
                     ELSE 1 + CAST(CEIL((k - m1) * 1.0 / ml) AS INT)
                END AS n_chunks
      FROM geo
    ),
    chunks AS (
      SELECT doc_id, L, k, m1, ml, n_chunks,
             CAST(UNNEST(range(n_chunks)) AS INT) AS "offset"
      FROM nch
    ),
    sized AS (
      SELECT doc_id, L, "offset",
             CASE WHEN "offset" = 0 THEN LEAST(k, m1)
                  WHEN "offset" < n_chunks - 1 THEN ml
                  ELSE (k - m1) - (n_chunks - 2) * ml END AS u
      FROM chunks
    ),
    texts AS (
      SELECT doc_id, "offset",
             CASE WHEN "offset" = 0 THEN '' ELSE repeat('w', 200) || ' ' END
               || LEFT(repeat(repeat('w', L) || chr(10) || chr(10), CAST(u AS INT)),
                       CAST(u * (L + 2) - 2 AS INT)) AS chunk
      FROM sized
    )
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, "offset",
           CAST(LENGTH(chunk) AS INT) AS chunk_len,
           md5(chunk) AS chunk_md5
    FROM texts
"""


@register("q54_chunk_overlap", oracle=_Q54_ORACLE)
def q54_chunk_overlap(spark, sf_dir):
    from sparkextract.spark.job import extract_exploded

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.lit(200) + F.col("n_chars") % 354).cast("int").alias("L"),
        (F.lit(3) + F.col("doc_id") % 12).cast("int").alias("k"),
    )
    unit = F.repeat(F.lit("w"), F.col("L"))
    body = F.array_join(F.array_repeat(unit, F.col("k")), "\n\n")
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            body.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    out = extract_exploded(docs.select("doc_id", spans.alias("spans")))
    return out.select(
        "doc_id",
        "offset",
        F.length("text").alias("chunk_len"),
        F.md5("text").alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# q55: the reference's composed rerank pipeline as ONE query
# (/root/reference/src/rag/rag_pipeline.py:536-580): vector-similarity
# candidates -> keyword-overlap boost (overlap * 0.01, rag_pipeline.py:
# 561-564) -> re-sort -> top-3. The pieces are individually green (q27
# similarity, q36 overlap, q06 top-k); this exercises the join -> score ->
# window composition in a single plan. Scale shape: the candidate set is
# top-k (tiny) and BROADCAST into the documents join, so the big table
# never shuffles; the final top-3 is a TakeOrderedAndProject.
_QUERY_WORDS = "table join window filter merge"

_Q55_ORACLE = f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id,
             ROUND(list_sum(list_transform(range(1, 65),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
               / ( sqrt(list_sum(list_transform(range(1, 65),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                 * sqrt(list_sum(list_transform(range(1, 65),
                     i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ), 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id > 0
      ORDER BY cosine DESC, e.vec_id ASC
      LIMIT 10
    ),
    scored AS (
      SELECT c.vec_id, c.cosine,
             CAST(LENGTH(list_intersect(string_split('{_QUERY_WORDS}', ' '),
                                        list_distinct(string_split(d.text, ' ')))) AS INT) AS overlap
      FROM cand c JOIN documents d ON d.doc_id = c.vec_id
    )
    SELECT vec_id, cosine, overlap,
           ROUND(cosine + overlap * 0.01, 6) AS rerank_score
    FROM scored
    ORDER BY rerank_score DESC, vec_id ASC
    LIMIT 3
"""


@register("q55_rerank_topk", oracle=_Q55_ORACLE)
def q55_rerank_topk(spark, sf_dir):
    from sparkextract.queries.wave3 import _dot, _norm

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = (
        emb.filter(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qv"))
                / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    overlap = F.size(
        F.array_intersect(
            F.split(F.lit(_QUERY_WORDS), " "), F.array_distinct(F.split("text", " "))
        )
    )
    scored = docs.join(
        F.broadcast(cand), docs["doc_id"] == cand["vec_id"]
    ).select("vec_id", "cosine", overlap.alias("overlap"))
    return (
        scored.select(
            "vec_id",
            "cosine",
            "overlap",
            F.round(F.col("cosine") + F.col("overlap") * 0.01, 6).alias("rerank_score"),
        )
        .orderBy(F.desc("rerank_score"), F.asc("vec_id"))
        .limit(3)
    )
