"""Remaining scalar/window operator shapes from SURVEY.md §2: F3 page-
marker interpolation, F7 keyword-overlap scoring, W3 positional ordinals,
and the MinHash band→bucket-join clustering step (the LSH dedup join that
follows q19's signatures)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkextract.queries.base import load, register


# --------------------------------------------------------------------------
# F3: `--- Page N ---` interpolation (reference src/text_extractor.py:97,
# 218,451) — group-concat with ordinal markers: the first 3 docs of each
# source render as one paged text blob.
@register(
    "q35_page_concat",
    oracle="""
    WITH pages AS (
      SELECT source, text,
             row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS pn
      FROM documents
    )
    SELECT source,
           string_agg('--- Page ' || CAST(pn AS VARCHAR) || ' ---' || chr(10) || text,
                      chr(10) ORDER BY pn ASC) AS paged_text
    FROM pages WHERE pn <= 3
    GROUP BY source
    """,
)
def q35_page_concat(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.asc("doc_id"))
    pages = docs.withColumn("pn", F.row_number().over(w)).filter(F.col("pn") <= 3)
    page_text = F.concat(
        F.lit("--- Page "), F.col("pn").cast("string"), F.lit(" ---\n"), F.col("text")
    )
    return (
        pages.select("source", "pn", page_text.alias("pt"))
        .groupBy("source")
        .agg(
            F.concat_ws(
                "\n", F.transform(F.array_sort(F.collect_list(F.struct("pn", "pt"))), lambda x: x["pt"])
            ).alias("paged_text")
        )
    )


# --------------------------------------------------------------------------
# F7: keyword-overlap score |words(q) ∩ words(doc)| * 0.01 (reference
# rag_pipeline.py:561-564) against a fixed query string.
_QUERY_WORDS = "table join window filter merge"


@register(
    "q36_keyword_overlap",
    oracle=f"""
    SELECT doc_id,
           ROUND(LENGTH(list_intersect(string_split('{_QUERY_WORDS}', ' '),
                                       list_distinct(string_split(text, ' ')))) * 0.01,
                 6) AS overlap_score
    FROM documents
    WHERE LENGTH(list_intersect(string_split('{_QUERY_WORDS}', ' '),
                                list_distinct(string_split(text, ' ')))) >= 3
    """,
)
def q36_keyword_overlap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    overlap = F.size(
        F.array_intersect(
            F.split(F.lit(_QUERY_WORDS), " "), F.array_distinct(F.split("text", " "))
        )
    )
    return (
        docs.select("doc_id", F.round(overlap * 0.01, 6).alias("overlap_score"), overlap.alias("_n"))
        .filter(F.col("_n") >= 3)
        .drop("_n")
    )


# --------------------------------------------------------------------------
# W3: positional ordinals via posexplode (the enumerate(pages, 1) analog,
# reference table_extractor.py:423) — first two tokens of each doc with
# their positions.
@register(
    "q37_token_positions",
    oracle="""
    SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, tok
    FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ) WHERE pos <= 2
    """,
)
def q37_token_positions(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .filter(F.col("pos") <= 1)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


# --------------------------------------------------------------------------
# MinHash band -> bucket equi-join clustering (the step after q19's
# signatures): docs sharing a band signature form candidate dup clusters.
# The corpus is dup-free, so near-dup pairs are injected (a copy of every
# 11th doc with its first 10 chars changed — MinHash over the 256-char
# head still collides on most shingles; band-0 min is unchanged whenever
# the minimum shingle lies beyond the edit).
@register(
    "q38_minhash_clusters",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, 'xxxxxxxxxx' || SUBSTRING(text, 11) AS text
      FROM documents WHERE doc_id % 11 = 0
    ), sigs AS (
      SELECT doc_id,
             list_min(list_transform(range(1, GREATEST(LENGTH(SUBSTRING(text,1,256)) - 7, 1) + 1),
                      i -> md5('b0|' || SUBSTRING(SUBSTRING(text,1,256), i, 8)))) AS sig0
      FROM corpus
    )
    SELECT sig0, CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM sigs GROUP BY sig0 HAVING COUNT(*) > 1
    """,
)
def q38_minhash_clusters(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit("xxxxxxxxxx"), F.expr("substring(text, 11)")).alias("text"),
    )
    corpus = docs.unionByName(near)
    head = F.substring("text", 1, 256)
    n_sh = F.greatest(F.length(head) - 7, F.lit(1))
    sig0 = F.array_min(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.md5(F.concat(F.lit("b0|"), F.substring(head, i, F.lit(8)))),
        )
    )
    return (
        corpus.select("doc_id", sig0.alias("sig0"))
        .groupBy("sig0")
        .agg(F.count("*").alias("cluster_size"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("cluster_size") > 1)
    )
