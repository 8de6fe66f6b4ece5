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


# --------------------------------------------------------------------------
# q110: SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023, arXiv:2303.09540) —
# the cluster-then-dedup composition: k-means-style assignment of every
# embedding to its nearest centroid, then pairwise cosine ONLY within a
# cluster; a vector is a semantic duplicate when any lower-id cluster
# mate sits at cosine >= threshold (greedy first-writer-wins sweep, the
# deterministic analog of the paper's keep-one-per-tight-group rule).
# Output is the per-cluster dedup ledger the pipeline reports.
#
# Scale shape: assignment is a broadcast of k tiny centroids + a
# map-side-combinable max_by groupBy (the de-skew form, NOT a window —
# the same lesson as the round-5 q96/q99 fix); the pairwise stage is an
# equi-join keyed by cluster id, so cost is sum(|cluster|^2), bounded by
# the paper's knob: k grows with N (k ~ N / target_cluster_size), never
# all-pairs. Here k = 8 (the q46 centroid table) for a ~630-vector
# corpus; twins are injected exactly like q53 so real near-dups exist.
# Reference intent: near-identical retrieval suppression,
# /root/reference/src/rag/vector_database.py:184-189.
_Q110_THRESHOLD = 0.95


def _cos_pair_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i]))"
        f" / ( sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> {a}[i] * {a}[i])))"
        f"   * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> {b}[i] * {b}[i]))) )"
    )


def _q110_oracle() -> str:
    from sparkextract.queries.dedup2 import _DIM

    return f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(range(1, {_DIM + 1}),
               i -> CASE WHEN i = 1 THEN CAST(embedding[1] AS DOUBLE) + 0.25
                         ELSE CAST(embedding[i] AS DOUBLE) END)
      FROM embeddings WHERE vec_id % 7 = 0
    ),
    cents AS (
      SELECT vec_id AS cent_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings WHERE vec_id BETWEEN 1 AND 8
    ),
    assign AS (
      SELECT c.vec_id, c.e, ct.cent_id AS cell
      FROM corpus c, cents ct
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY c.vec_id
        ORDER BY ROUND({_cos_pair_sql('c.e', 'ct.cv', _DIM)}, 6) DESC,
                 ct.cent_id ASC) = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND({_cos_pair_sql('a.e', 'b.e', _DIM)}, 6) >= {_Q110_THRESHOLD}
    )
    SELECT a.cell, COUNT(*) AS n_members, COUNT(d.vec_id) AS n_dups,
           COUNT(*) - COUNT(d.vec_id) AS n_survivors
    FROM assign a LEFT JOIN dups d ON a.vec_id = d.vec_id
    GROUP BY a.cell
    ORDER BY a.cell
    """


@register("q110_semantic_dedup", oracle=_q110_oracle())
def q110_semantic_dedup(spark, sf_dir):
    from sparkextract.queries.base import checkpoint_memo
    from sparkextract.queries.dedup2 import _banded_corpus, _dot, _norm

    def build_assign():
        corpus = _banded_corpus(spark, sf_dir)
        cents = (
            load(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id").between(1, 8))
            .select(
                F.col("vec_id").alias("cent_id"),
                F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
            )
        )
        ccos = F.round(
            _dot(F.col("e"), F.col("cv")) / (_norm(F.col("e")) * _norm(F.col("cv"))), 6
        )
        # argmax via map-side-combinable max_by (ROUND-6 score, cent_id
        # asc tie-break = max of (ccos, -cent_id)), not a window over
        # vec_id
        return (
            corpus.crossJoin(F.broadcast(cents))
            .withColumn("ccos", ccos)
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    F.col("cent_id"),
                    F.struct(F.col("ccos").alias("c"), (-F.col("cent_id")).alias("t")),
                ).alias("cell"),
                F.first("e").alias("e"),
            )
        )

    # The assignment table feeds three subtrees (pair-join left/right +
    # the ledger join); materialize it ONCE (at real scale this is the
    # cluster-assignment write every SemDeDup implementation persists
    # before the within-cluster pass).
    assign = checkpoint_memo(spark, sf_dir, "q110_assign", build_assign)
    a = assign.select(
        F.col("vec_id").alias("l"), F.col("cell").alias("cl"), F.col("e").alias("ea")
    )
    b = assign.select(
        F.col("vec_id").alias("r"), F.col("cell").alias("cr"), F.col("e").alias("eb")
    )
    pcos = F.round(
        _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
    )
    dups = (
        a.join(b, (F.col("cl") == F.col("cr")) & (F.col("l") < F.col("r")))
        .withColumn("cos", pcos)
        .filter(F.col("cos") >= _Q110_THRESHOLD)
        .select(F.col("r").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assign.join(dups, "vec_id", "left")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("is_dup").alias("n_dups"),
        )
        .withColumn("n_survivors", F.col("n_members") - F.col("n_dups"))
        .orderBy("cell")
    )
