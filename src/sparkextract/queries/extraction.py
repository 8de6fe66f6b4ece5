"""The extraction pipeline as driver-checked queries.

The full extractor is not SQL-expressible (it is the mapInPandas core),
but for *simple payloads* its output IS exactly derivable in SQL: the
driver's ``documents.text`` values are single-line, single-spaced,
punctuation-free strings of 48-553 chars, so

- a ``text``/``pdf_layout`` input span with >= MIN_CHUNK_SIZE chars yields
  exactly one output text span equal to the payload (one paragraph, under
  CHUNK_SIZE, nothing to table/form-detect);
- an ``html`` input span whose only main-content block is the payload
  yields the same single span (nav/footer/script boilerplate stripped);
- payloads < MIN_CHUNK_SIZE yield nothing (P4);
- every ``media`` input span yields one ``image_ocr`` span with its
  media_ref verbatim.

q40/q41 exploit this: the Spark side runs the REAL pipeline
(mapInPandas extraction on an interleaved corpus built from the documents
table); the oracle derives the expected spans in pure SQL. This makes
boilerplate-stripping, chunk-gating, media passthrough, kind ordering and
offset numbering all driver-verified — not just pytest-verified.

q42+ are rows-only (no SQL oracle): full-corpus extraction stats over the
synthetic interleaved corpus, exercising the mega-doc path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkextract.queries.base import load, register


def interleaved_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the flat ``documents`` table into the BASELINE.json input_hint
    shape. Routing is deterministic on doc_id: %3==0 → text (+media span),
    %3==1 → html-wrapped, %3==2 → pdf_layout."""
    docs = load(spark, sf_dir, "documents")
    payload = F.col("text")
    html_payload = F.concat(
        F.lit(
            "<html><body><nav><a href='/home'>home home home</a></nav><article><p>"
        ),
        payload,
        F.lit(
            "</p></article><script>var t=1;</script>"
            "<footer><p>copyright footer boilerplate text</p></footer></body></html>"
        ),
    )
    kind = F.element_at(
        F.array(F.lit("text"), F.lit("html"), F.lit("pdf_layout")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    first_span = F.struct(
        kind.alias("kind"),
        F.when(kind == "html", html_payload).otherwise(payload).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/1")).alias(
            "media_ref"
        ),
        F.lit(1).alias("offset"),
    )
    spans = F.when(
        F.col("doc_id") % 3 == 0, F.array(first_span, media_span)
    ).otherwise(F.array(first_span))
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans"))


# --------------------------------------------------------------------------
# THE extraction invariant, driver-checked: real pipeline vs SQL-derived
# expected spans (kind, text, media_ref, offset) — span-sequence equality.
@register(
    "q40_extract_passthrough",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'text' AS kind, text,
           CAST(NULL AS VARCHAR) AS media_ref, 0 AS offset
    FROM documents WHERE n_chars >= 100
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'image_ocr' AS kind,
           CAST(NULL AS VARCHAR) AS text,
           'img://' || CAST(doc_id AS VARCHAR) || '/1' AS media_ref,
           CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS offset
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q40_extract_passthrough(spark, sf_dir):
    from sparkextract.spark.job import extract_exploded

    return extract_exploded(interleaved_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# A5/A10 extraction metrics, SQL-derivable for the simple-payload corpus.
@register(
    "q41_extract_kind_stats",
    oracle="""
    WITH spans AS (
      SELECT 'text' AS kind, n_chars AS len FROM documents WHERE n_chars >= 100
      UNION ALL
      SELECT 'image_ocr' AS kind, NULL AS len FROM documents WHERE doc_id % 3 = 0
    )
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(len), 0) AS BIGINT) AS total_chars
    FROM spans GROUP BY kind
    """,
)
def q41_extract_kind_stats(spark, sf_dir):
    from sparkextract.spark.job import extract_exploded

    out = extract_exploded(interleaved_docs(spark, sf_dir))
    return out.groupBy("kind").agg(
        F.count("*").alias("n_spans"),
        F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Rows-only (non-SQL-expressible): full synthetic interleaved corpus with
# mega-docs, tables, forms — end-to-end through the skew-aware pipeline.
@register("q42_extract_synthetic_corpus")
def q42_extract_synthetic_corpus(spark, sf_dir):
    from sparkextract.spark.datagen import corpus_df
    from sparkextract.spark.job import extract_exploded

    n_docs = 400 if "0.001" in sf_dir else 1200
    docs = corpus_df(spark, n_docs, seed=42)
    out = extract_exploded(docs, skew_threshold=256)
    return out.groupBy("kind").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# Rows-only: assembled span-array output (the Iceberg-table-out shape).
@register("q43_extract_assembled")
def q43_extract_assembled(spark, sf_dir):
    from sparkextract.spark.job import extract_documents

    out = extract_documents(interleaved_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.coalesce(
            F.size(F.filter("spans", lambda s: s["kind"] == "image_ocr")), F.lit(0)
        ).alias("n_media"),
    )
