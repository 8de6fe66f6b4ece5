"""Text-analysis + dedup operator surface (training-data pipeline ops):
exact dedup, MinHash-LSH signatures, n-gram Jaccard, fingerprinting,
language-ID heuristic, quality scoring, token counting — SURVEY.md §2.7-
2.8 plus the large-scale pipeline extras.

All hash math is md5-based so Spark and DuckDB produce identical values
(both emit lowercase hex); min-over-hash comparisons are plain VARCHAR
ordering, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkextract.queries.base import load, register


# --------------------------------------------------------------------------
# D4/D5 exact dedup by content hash. The corpus has no natural dups, so the
# query builds one deterministically: base docs ∪ a shifted copy of every
# 7th doc, then clusters by md5(text). Scale: one shuffle on a 32-char key.
@register(
    "q11_dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    )
    SELECT md5(text) AS content_hash,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM corpus
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
)
def q11_dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("cluster_size") > 1)
    )


# --------------------------------------------------------------------------
# J1 self-join shape: duplicate pairs via hash equi-join (the Spark-first
# replacement of the reference's O(n^2) similarity loop,
# /root/reference/src/table_extractor.py:144-152).
@register(
    "q13_dup_pairs_selfjoin",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id
    FROM corpus a JOIN corpus b
      ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
    """,
)
def q13_dup_pairs_selfjoin(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup).withColumn("h", F.md5("text"))
    a = corpus.alias("a")
    b = corpus.alias("b")
    return a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("left_id"), F.col("b.doc_id").alias("right_id"))


# --------------------------------------------------------------------------
# MinHash signatures (LSH band minima): shingle = 8-char window over the
# first 256 chars; band signature = min md5(band_salt || shingle). At scale
# this is shingle-explode → per-band min — a single map-side-combinable agg;
# here the array form keeps it shuffle-free per doc.
@register(
    "q19_minhash_signature",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(range(1, GREATEST(LENGTH(SUBSTRING(text,1,256)) - 7, 1) + 1),
                    i -> md5('b0|' || SUBSTRING(SUBSTRING(text,1,256), i, 8)))) AS sig0,
           list_min(list_transform(range(1, GREATEST(LENGTH(SUBSTRING(text,1,256)) - 7, 1) + 1),
                    i -> md5('b1|' || SUBSTRING(SUBSTRING(text,1,256), i, 8)))) AS sig1,
           list_min(list_transform(range(1, GREATEST(LENGTH(SUBSTRING(text,1,256)) - 7, 1) + 1),
                    i -> md5('b2|' || SUBSTRING(SUBSTRING(text,1,256), i, 8)))) AS sig2,
           list_min(list_transform(range(1, GREATEST(LENGTH(SUBSTRING(text,1,256)) - 7, 1) + 1),
                    i -> md5('b3|' || SUBSTRING(SUBSTRING(text,1,256), i, 8)))) AS sig3
    FROM documents
    """,
)
def q19_minhash_signature(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    head = F.substring("text", 1, 256)
    n_sh = F.greatest(F.length(head) - 7, F.lit(1))

    def band_min(b: int):
        # NB: a one-arg lambda — a default-arg closure (lambda i, b=b: ...)
        # would make Spark treat it as the 2-arg (element, index) form
        prefix = f"b{b}|"
        return F.array_min(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.md5(F.concat(F.lit(prefix), F.substring(head, i, F.lit(8)))),
            )
        )

    return docs.select("doc_id", *[band_min(b).alias(f"sig{b}") for b in range(4)])


# --------------------------------------------------------------------------
# n-gram (token trigram) Jaccard between each doc and its successor within
# a source — the near-dup scoring primitive.
@register(
    "q20_jaccard_neighbors",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS t FROM documents
    ), pairs AS (
      SELECT doc_id AS left_id,
             lead(doc_id) OVER w AS right_id,
             t AS ta,
             lead(t) OVER w AS tb
      FROM toks
      WINDOW w AS (PARTITION BY source ORDER BY doc_id ASC)
    )
    SELECT left_id, right_id,
           ROUND(CAST(LENGTH(list_intersect(ta, tb)) AS DOUBLE) /
                 LENGTH(list_distinct(list_concat(ta, tb))), 6) AS jaccard
    FROM pairs WHERE right_id IS NOT NULL
    """,
)
def q20_jaccard_neighbors(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("t")
    )
    w = W.partitionBy("source").orderBy(F.asc("doc_id"))
    paired = docs.select(
        F.col("doc_id").alias("left_id"),
        F.lead("doc_id").over(w).alias("right_id"),
        F.col("t").alias("ta"),
        F.lead("t").over(w).alias("tb"),
    ).filter(F.col("right_id").isNotNull())
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_distinct(F.concat("ta", "tb")))
    return paired.select(
        "left_id", "right_id", F.round(inter.cast("double") / union, 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# P2/F13 normalization + fingerprint projection (document fingerprinting).
@register(
    "q21_fingerprint",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(lower(regexp_replace(text, '[^a-z ]', '', 'g')))) AS BIGINT) AS n_unique
    FROM documents GROUP BY lang
    """,
)
def q21_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", "[^a-z ]", "")))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
    )


# --------------------------------------------------------------------------
# Token counting (whitespace tokenizer) — F1/F2 stats family.
@register(
    "q22_token_stats",
    oracle="""
    SELECT lang,
           CAST(SUM(LENGTH(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(LENGTH(regexp_extract_all(text, '\\S+'))) AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(MAX(LENGTH(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS max_tokens
    FROM documents GROUP BY lang
    """,
)
def q22_token_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    ntok = F.regexp_count("text", F.lit(r"\S+"))
    return docs.groupBy("lang").agg(
        F.sum(ntok).alias("total_tokens"),
        (F.sum(ntok).cast("double") / F.count("*")).alias("avg_tokens"),
        F.max(ntok).cast("long").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# Top-20 token frequency (explode + agg + top-k with tie-break).
@register(
    "q23_token_topk",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) WHERE token != ''
    GROUP BY token
    ORDER BY freq DESC, token ASC
    LIMIT 20
    """,
)
def q23_token_topk(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Language-ID heuristic (stopword-hit n-gram scoring, F6 classify chain).
@register(
    "q24_lang_id",
    oracle="""
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT lang,
             CASE WHEN LENGTH(regexp_extract_all(text, '\\b(the|a|of)\\b')) >= 3 THEN 'en'
                  WHEN LENGTH(regexp_extract_all(text, '\\b(data|table|row)\\b')) >= 3 THEN 'tech'
                  ELSE 'other' END AS predicted
      FROM documents
    ) GROUP BY lang, predicted
    """,
)
def q24_lang_id(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    en_hits = F.regexp_count("text", F.lit(r"\b(the|a|of)\b"))
    tech_hits = F.regexp_count("text", F.lit(r"\b(data|table|row)\b"))
    predicted = (
        F.when(en_hits >= 3, "en").when(tech_hits >= 3, "tech").otherwise("other")
    )
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Quality scoring (length + stopword-ratio factors, A2 analog) with a
# decimal-exact grouped average.
@register(
    "q25_quality_score",
    oracle="""
    SELECT source,
           CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_quality,
           CAST(COUNT(*) FILTER (WHERE q >= 0.5) AS BIGINT) AS n_good
    FROM (
      SELECT source,
             ROUND(0.4 * LEAST(CAST(n_chars AS DOUBLE) / 1000, 1.0)
                 + 0.3 * LEAST(CAST(LENGTH(regexp_extract_all(text, '\\b(the|a|of|and)\\b')) AS DOUBLE) / 10, 1.0)
                 + 0.3 * LEAST(CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 100, 1.0), 6) AS q
      FROM documents
    ) GROUP BY source
    """,
)
def q25_quality_score(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    stop_hits = F.regexp_count("text", F.lit(r"\b(the|a|of|and)\b"))
    ntok = F.regexp_count("text", F.lit(r"\S+"))
    q = F.round(
        0.4 * F.least(F.col("n_chars").cast("double") / 1000, F.lit(1.0))
        + 0.3 * F.least(stop_hits.cast("double") / 10, F.lit(1.0))
        + 0.3 * F.least(ntok.cast("double") / 100, F.lit(1.0)),
        6,
    )
    return (
        docs.select("source", q.alias("q"))
        .groupBy("source")
        .agg(
            (F.sum(F.col("q").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
                "avg_quality"
            ),
            F.sum(F.when(F.col("q") >= 0.5, 1).otherwise(0)).alias("n_good"),
        )
    )


# --------------------------------------------------------------------------
# F12: JSON prop extraction + conditional agg.
@register(
    "q26_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS BIGINT) AS n_high
    FROM events GROUP BY event_type
    """,
)
def q26_json_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_high"),
    )
