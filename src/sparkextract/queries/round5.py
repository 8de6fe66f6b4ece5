"""Round-5 operators: the structured-streaming tier made driver-visible
(q108 — the incremental AvailableNow drain's committed output, full-row
oracle-checked like q95 did for the manifest) and the multimodal
pseudo-OCR decode surface (q109 — binary payload -> cleaned OCR text
through ``mapInPandas``, reference src/image_extractor.py:337-549).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register
from sparkextract.queries.extraction import ocr_sql

# --------------------------------------------------------------------------
# q108: STREAMING INCREMENTAL EXTRACTION, DRIVER-CHECKED — two
# Trigger.AvailableNow drains over a growing file source (first the even
# half of the interleaved corpus, then the odd half lands and only IT is
# processed — the checkpoint, not a manifest, carries the resume state),
# then the exactly-once committed output is read back through the sink's
# _spark_metadata log and compared full-row against the same SQL-derived
# expectation as q40 (the passthrough property of the interleaved wrap).
# Reference analog: idempotent re-ingest (/root/reference/src/rag/
# rag_pipeline.py:97-105) as a *continuous arrival* pipeline instead of
# a rerun loop.
# Scale shape: the drain is the batch whole-doc map (zero shuffles after
# the scan); each incremental run touches only newly-arrived files, so
# steady-state cost tracks the arrival rate, never the corpus size.
_Q108_ORACLE = f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'text' AS kind, text,
           CAST(NULL AS VARCHAR) AS media_ref, 0 AS offset
    FROM documents WHERE n_chars >= 100
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'image_ocr' AS kind,
           {ocr_sql("'img://' || CAST(doc_id AS VARCHAR) || '/1'")} AS text,
           'img://' || CAST(doc_id AS VARCHAR) || '/1' AS media_ref,
           CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS offset
    FROM documents WHERE doc_id % 3 = 0
"""

# one two-drain simulation per (session, input); repeated invocations
# (panel rebuilds, plan dumps) re-read the committed sink
_Q108_DONE: set[tuple[str, str]] = set()


def _stream_root(spark, sf_dir: str, tag: str) -> str:
    import glob
    import hashlib
    import shutil
    import tempfile

    key = hashlib.md5(
        (spark.sparkContext.applicationId + "|" + sf_dir).encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"sparkextract_{tag}_{key}")
    for stale in glob.glob(os.path.join(tempfile.gettempdir(), f"sparkextract_{tag}_*")):
        if stale != root:
            shutil.rmtree(stale, ignore_errors=True)
    return root


@register("q108_streaming_incremental", oracle=_Q108_ORACLE)
def q108_streaming_incremental(spark, sf_dir):
    import shutil

    from sparkextract.queries.extraction import interleaved_docs
    from sparkextract.streaming.incremental import incremental_extract

    root = _stream_root(spark, sf_dir, "q108")
    inp = os.path.join(root, "in")
    outp = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key not in _Q108_DONE:
        shutil.rmtree(root, ignore_errors=True)
        docs = interleaved_docs(spark, sf_dir)
        even = F.col("doc_id").cast("long") % 2 == 0
        docs.filter(even).write.parquet(inp)
        incremental_extract(spark, inp, outp, ckpt).awaitTermination()
        docs.filter(~even).write.mode("append").parquet(inp)
        incremental_extract(spark, inp, outp, ckpt).awaitTermination()
        _Q108_DONE.add(memo_key)
    # batch read honors the sink's _spark_metadata commit log: only
    # exactly-once-committed files are visible
    return spark.read.parquet(outp).select(
        "doc_id", "kind", "text", "media_ref", "offset"
    )


# --------------------------------------------------------------------------
# q109: MEDIA OCR DECODE — binary payloads -> cleaned pseudo-OCR text
# rows via the Arrow-batched ``ocr_media`` surface. The OCR engine is
# the deterministic stub (core/ocr.py) so the DuckDB oracle reproduces
# the text byte-for-byte from the payload construction; the Spark
# plumbing (map-only over scan splits, payload bytes never leave the
# reading executor, only the short text moves on) is the real shape.
# Reference analog: tesseract/easyocr OCR + whitespace cleanup,
# /root/reference/src/image_extractor.py:337-549,533-549.
_Q109_ORACLE = f"""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           (['image','audio','video','pdf'])[(doc_id % 4) + 1] AS media_type,
           {ocr_sql("substr(text, 1, 200)")} AS ocr_text,
           CAST(29 AS INT) AS n_ocr_chars
    FROM documents
"""


@register("q109_media_ocr", oracle=_Q109_ORACLE)
def q109_media_ocr(spark, sf_dir):
    from sparkextract.queries.wave3 import _media_df
    from sparkextract.spark.multimodal import ocr_media

    out = ocr_media(_media_df(spark, sf_dir, 200))
    return out.select("media_id", "media_type", "ocr_text", "n_ocr_chars")
