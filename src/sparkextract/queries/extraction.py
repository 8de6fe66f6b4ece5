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
  media_ref verbatim and deterministic pseudo-OCR text (core/ocr.py)
  derived from md5(media_ref) — reproduced in SQL by :func:`ocr_sql`.

q40/q41 exploit this: the Spark side runs the REAL pipeline
(mapInPandas extraction on an interleaved corpus built from the documents
table); the oracle derives the expected spans in pure SQL. This makes
boilerplate-stripping, chunk-gating, media passthrough, kind ordering and
offset numbering all driver-verified — not just pytest-verified.

q42 wraps the same documents into MEGA documents (hundreds of spans per
doc) so the skew split/reassemble path (spark/job.py explode → phase-1 →
finalize) flows through the oracle gate with full-row verification; q43
driver-checks the assembled span-array output shape the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkextract.core.ocr import OCR_TEXT_LEN
from sparkextract.queries.base import load, register


def ocr_sql(ref_expr: str) -> str:
    """DuckDB twin of core/ocr.py pseudo_ocr_text for a media_ref SQL
    expression — byte-identical to the engine's cleaned OCR output."""
    return (
        f"'scan ' || substring(md5({ref_expr}), 1, 8) || ' ' || "
        f"substring(md5({ref_expr}), 9, 8) || ' page ' || "
        f"CAST(CAST(('0x' || substring(md5({ref_expr}), 17, 1)) AS UBIGINT)"
        f" % 10 AS VARCHAR)"
    )


def _routed_kind():
    """doc_id%3 routing shared by q40-q43: 0 → text, 1 → html, 2 → pdf."""
    return F.element_at(
        F.array(F.lit("text"), F.lit("html"), F.lit("pdf_layout")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )


def _routed_payload(kind):
    """The span text for a routed kind: html payloads are wrapped in
    boilerplate the extractor must strip back off."""
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
    return F.when(kind == "html", html_payload).otherwise(payload)


def interleaved_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the flat ``documents`` table into the BASELINE.json input_hint
    shape. Routing is deterministic on doc_id: %3==0 → text (+media span),
    %3==1 → html-wrapped, %3==2 → pdf_layout."""
    return wrap_docs(load(spark, sf_dir, "documents"))


def wrap_docs(docs: DataFrame) -> DataFrame:
    """Wrap any flat (doc_id, text) frame into the interleaved span shape
    (same deterministic doc_id%3 routing); shared with q94's augmented
    corpus."""
    kind = _routed_kind()
    first_span = F.struct(
        kind.alias("kind"),
        _routed_payload(kind).alias("text"),
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
    oracle=f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'text' AS kind, text,
           CAST(NULL AS VARCHAR) AS media_ref, 0 AS offset
    FROM documents WHERE n_chars >= 100
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'image_ocr' AS kind,
           {ocr_sql("'img://' || CAST(doc_id AS VARCHAR) || '/1'")} AS text,
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
    oracle=f"""
    WITH spans AS (
      SELECT 'text' AS kind, n_chars AS len FROM documents WHERE n_chars >= 100
      UNION ALL
      SELECT 'image_ocr' AS kind, {OCR_TEXT_LEN} AS len
      FROM documents WHERE doc_id % 3 = 0
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
# q42: the MEGA-document skew path, full-row oracle-verified. Even doc_ids
# fold into 4 mega documents of hundreds of spans each (above the forced
# skew_threshold → explode / salted phase-1 / applyInPandas finalize);
# odd doc_ids stay singleton docs (whole-doc mapInPandas path) — BOTH
# paths run in one plan and their union is compared row-for-row against
# the SQL-derived expectation. Every doc_id%5==0 doc also contributes a
# media span, so image_ocr passthrough and the texts-before-images kind
# ordering (core/extract.py finalize) are verified through the split too.
_Q42_ORACLE = f"""
    WITH contrib AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 'mega-' || CAST((doc_id % 8) // 2 AS VARCHAR)
                  ELSE 'doc-' || CAST(doc_id AS VARCHAR) END AS out_doc,
             text, n_chars
      FROM documents
    ),
    items AS (
      SELECT out_doc, 0 AS kind_rank, doc_id AS k, 'text' AS kind, text,
             CAST(NULL AS VARCHAR) AS media_ref
      FROM contrib WHERE n_chars >= 100
      UNION ALL
      SELECT out_doc, 1 AS kind_rank, doc_id AS k, 'image_ocr' AS kind,
             {ocr_sql("'img://' || CAST(doc_id AS VARCHAR) || '/m'")} AS text,
             'img://' || CAST(doc_id AS VARCHAR) || '/m' AS media_ref
      FROM contrib WHERE doc_id % 5 = 0
    )
    SELECT out_doc AS doc_id, kind, text, media_ref,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY out_doc ORDER BY kind_rank, k) - 1 AS INT) AS offset
    FROM items
"""


def mega_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold the ``documents`` table into 4 mega docs (even doc_ids) plus
    singleton docs (odd doc_ids); doc_id%5==0 rows add a media span."""
    docs = load(spark, sf_dir, "documents")
    out_doc = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("mega-"), ((F.col("doc_id") % 8) / 2).cast("int").cast("string")),
    ).otherwise(F.concat(F.lit("doc-"), F.col("doc_id").cast("string")))
    main_off = F.when(F.col("doc_id") % 2 == 0, F.col("doc_id")).otherwise(F.lit(0))
    kind = _routed_kind()
    main = docs.select(
        out_doc.alias("doc_id"),
        F.struct(
            kind.alias("kind"),
            _routed_payload(kind).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            main_off.cast("int").alias("offset"),
        ).alias("s"),
    )
    media = docs.filter(F.col("doc_id") % 5 == 0).select(
        out_doc.alias("doc_id"),
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/m")).alias(
                "media_ref"
            ),
            (main_off + 1).cast("int").alias("offset"),
        ).alias("s"),
    )
    return (
        main.unionByName(media)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"), F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref")))).alias("_s"))
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda x: F.struct(
                    x["kind"].alias("kind"),
                    x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    x["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


@register("q42_extract_mega_skew", oracle=_Q42_ORACLE)
def q42_extract_mega_skew(spark, sf_dir):
    from sparkextract.spark.job import extract_exploded

    return extract_exploded(mega_docs(spark, sf_dir), skew_threshold=32)


# --------------------------------------------------------------------------
# q43: assembled span-array output (the Iceberg-table-out shape),
# oracle-verified per document on array size, media count, total text
# chars, and the leading span's kind (ordering witness).
@register(
    "q43_extract_assembled",
    oracle=f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CAST((CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)
              + (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS INT) AS n_spans,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_media,
           CAST((CASE WHEN n_chars >= 100 THEN n_chars ELSE 0 END)
              + (CASE WHEN doc_id % 3 = 0 THEN {OCR_TEXT_LEN} ELSE 0 END)
              AS INT) AS total_chars,
           CASE WHEN n_chars >= 100 THEN 'text'
                WHEN doc_id % 3 = 0 THEN 'image_ocr' END AS first_kind
    FROM documents
    """,
)
def q43_extract_assembled(spark, sf_dir):
    from sparkextract.spark.job import extract_documents

    out = extract_documents(interleaved_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.coalesce(
            F.size(F.filter("spans", lambda s: s["kind"] == "image_ocr")), F.lit(0)
        ).alias("n_media"),
        F.aggregate(
            "spans", F.lit(0), lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0))
        ).alias("total_chars"),
        F.try_element_at("spans", F.lit(1))["kind"].alias("first_kind"),
    )
