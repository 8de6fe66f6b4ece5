"""Round-4 operators: eval-set decontamination, the deterministic
analogs of the reference's last two RAG behaviors (citation assembly,
query expansion), the driver-visible manifest-state query, and the
end-to-end extract->quality->dedup corpus-clean composition.

Shared discipline (queries/base.py): md5-derived pseudo-randomness,
ROUND(...,6) before any float compare/order, tie-breaking ORDER BY under
every LIMIT, identical aliases in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, md5_bucket, md5_bucket_sql, register

# --------------------------------------------------------------------------
# q91: N-GRAM EVAL-SET DECONTAMINATION — the benchmark-contamination
# check every serious training-data pipeline runs (the 13-gram overlap
# test popularized by GPT-3/PaLM data cards): any training document
# sharing >= 1 length-K word n-gram with an evaluation document is
# suspect; docs above a contaminated-fraction threshold are dropped.
# Reference analog: per-chunk content hashing for duplicate detection
# (/root/reference/src/rag/text_processor.py:534) applied at token-
# window grain instead of chunk grain.
#
# Corpus construction: the eval set is the md5-bucket(doc_id)%20==0
# slice of documents (deterministic, engine-portable); the training
# corpus is every other document PLUS an injected verbatim copy of each
# eval doc at doc_id+3000000 (the q68 injection pattern), so the
# operator sees both the sparse natural-collision regime (~31-token
# vocabulary => some genuine shared 13-grams) and true contamination
# (copies with contam_frac 1.0 that the keep rule must reject).
#
# Shape: k-gram generation is DOC-LOCAL (transform over sequence +
# array_join of a slice — q88's no-shuffle pair-generation lesson);
# k-grams are md5-keyed; the overlap join is an equi-join on the k-gram
# hash. Scale shape: the eval side is a benchmark suite — tiny and
# broadcast — while the corpus side only ever shuffles for the per-doc
# rollup on doc_id; nothing is quadratic and no corpus self-join exists.
_Q91_K = 13
_Q91_MAX_FRAC = 0.2
_Q91_EVAL_BUCKETS = 20

_Q91_CORPUS = f"""
  SELECT doc_id, text FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q91_EVAL_BUCKETS)} <> 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, text FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q91_EVAL_BUCKETS)} = 0
"""

_Q91_ORACLE = f"""
WITH eval_docs AS (
  SELECT doc_id, text FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q91_EVAL_BUCKETS)} = 0
),
corpus AS (
  {_Q91_CORPUS}
),
ekg AS (
  SELECT DISTINCT md5(kgram) AS kh FROM (
    SELECT unnest(list_transform(range(1, len(a) - {_Q91_K} + 2),
                  i -> array_to_string(a[i:i+{_Q91_K - 1}], ' '))) AS kgram
    FROM (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS a
          FROM eval_docs)
    WHERE len(a) >= {_Q91_K})
),
ckg AS (
  SELECT DISTINCT doc_id, md5(kgram) AS kh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a) - {_Q91_K} + 2),
                  i -> array_to_string(a[i:i+{_Q91_K - 1}], ' '))) AS kgram
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS a
          FROM corpus)
    WHERE len(a) >= {_Q91_K})
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_kgrams,
       CAST(COUNT(e.kh) AS BIGINT) AS n_contam,
       ROUND(COUNT(e.kh) * 1.0 / COUNT(*), 6) AS contam_frac,
       (ROUND(COUNT(e.kh) * 1.0 / COUNT(*), 6) <= {_Q91_MAX_FRAC}) AS keep
FROM ckg c LEFT JOIN ekg e ON e.kh = c.kh
GROUP BY c.doc_id
"""


def _kgram_hashes(df, k: int):
    """(doc_id, text) -> (doc_id, kh): distinct md5 keys of the doc's
    word k-grams, generated doc-locally (no shuffle until the consumer's
    own agg/join)."""
    a = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    kgrams = F.when(
        F.size(a) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - k + 1),
            lambda i: F.array_join(F.slice(a, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("doc_id", F.explode(F.array_distinct(kgrams)).alias("kgram"))
        .select("doc_id", F.md5("kgram").alias("kh"))
    )


@register("q91_ngram_decontamination", oracle=_Q91_ORACLE)
def q91_ngram_decontamination(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = md5_bucket(F.col("doc_id"), _Q91_EVAL_BUCKETS) == 0
    eval_docs = docs.filter(is_eval)
    corpus = docs.filter(~is_eval).unionByName(
        eval_docs.select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
    )
    # the eval side is a benchmark suite: tiny at any scale -> broadcast
    ekg = F.broadcast(_kgram_hashes(eval_docs, _Q91_K).select("kh").distinct())
    ckg = _kgram_hashes(corpus, _Q91_K)
    hit = ekg.withColumn("contam", F.lit(1))
    counts = (
        ckg.join(hit, "kh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kgrams"),
            F.coalesce(F.sum("contam"), F.lit(0)).cast("long").alias("n_contam"),
        )
    )
    frac = F.round(F.col("n_contam").cast("double") / F.col("n_kgrams"), 6)
    return counts.select(
        "doc_id",
        "n_kgrams",
        "n_contam",
        frac.alias("contam_frac"),
        (frac <= _Q91_MAX_FRAC).alias("keep"),
    )

# --------------------------------------------------------------------------
# q92: CITATION ASSEMBLY — the deterministic analog of the reference's
# source-attribution step (_generate_citations,
# /root/reference/src/rag/rag_pipeline.py:620-638, and _build_context's
# "Source N (filename, Page P, Type):" formatting at :587-607): the
# retrieved+reranked+budgeted chunks from q58 are ranked, hydrated from
# the documents table, and rendered as one citation row each. Field
# analogs on this corpus: filename = 'doc_<id>.pdf'; page_number the
# deterministic doc_id%40+1 (the flat corpus carries no page metadata);
# content_type = source; similarity_score = rerank_score;
# confidence_score = the repo's q47 convention least(n_chars/1000, 1).
# Scale shape: q58's output is a <=10-row context set -> every join
# here broadcasts it; the big documents table never shuffles.
_Q92_ORACLE = None  # assigned below (needs wave5's q58 oracle)


def _q92_oracle() -> str:
    from sparkextract.queries.wave5 import _Q58_ORACLE

    return f"""
WITH retrieved AS (
  {_Q58_ORACLE}
),
ranked AS (
  SELECT vec_id, rerank_score,
         CAST(ROW_NUMBER() OVER (ORDER BY rerank_score DESC, vec_id ASC) AS INT)
           AS cite_index
  FROM retrieved
)
SELECT r.cite_index,
       'doc_' || CAST(r.vec_id AS VARCHAR) || '.pdf' AS filename,
       CAST(r.vec_id % 40 + 1 AS INT) AS page_number,
       d.source AS content_type,
       r.rerank_score AS similarity_score,
       ROUND(LEAST(d.n_chars / 1000.0, 1.0), 6) AS confidence_score,
       'Source ' || CAST(r.cite_index AS VARCHAR)
         || ' (doc_' || CAST(r.vec_id AS VARCHAR) || '.pdf, Page '
         || CAST(r.vec_id % 40 + 1 AS VARCHAR) || ', ' || d.source || ')'
         AS citation
FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
"""


@register("q92_citation_assembly", oracle=_q92_oracle())
def q92_citation_assembly(spark, sf_dir):
    from sparkextract.queries.wave5 import q58_retrieval_pipeline

    retrieved = q58_retrieval_pipeline(spark, sf_dir)
    w = Window.orderBy(F.desc("rerank_score"), F.asc("vec_id"))
    ranked = retrieved.select(
        "vec_id", "rerank_score", F.row_number().over(w).cast("int").alias("cite_index")
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    page = (F.col("vec_id") % 40 + 1).cast("int")
    filename = F.concat(F.lit("doc_"), F.col("vec_id").cast("string"), F.lit(".pdf"))
    return docs.join(
        F.broadcast(ranked), docs["doc_id"] == ranked["vec_id"]
    ).select(
        "cite_index",
        filename.alias("filename"),
        page.alias("page_number"),
        F.col("source").alias("content_type"),
        F.col("rerank_score").alias("similarity_score"),
        F.round(F.least(F.col("n_chars") / 1000.0, F.lit(1.0)), 6).alias(
            "confidence_score"
        ),
        F.concat(
            F.lit("Source "), F.col("cite_index").cast("string"),
            F.lit(" ("), filename, F.lit(", Page "), page.cast("string"),
            F.lit(", "), F.col("source"), F.lit(")"),
        ).alias("citation"),
    )


# --------------------------------------------------------------------------
# q93: QUERY EXPANSION — the deterministic analog of the reference's
# LLM query expansion (generate_query_expansion,
# /root/reference/src/rag/ollama_client.py:323-348): the LLM's "2-3
# alternative phrasings" become the top-2 corpus-co-occurring tokens per
# query term (presence-based document co-occurrence, df_ab desc with
# token tie-break), each appended to the original query; the original
# query rides along as variant 0 exactly like the reference's
# [original] + expansions. The q74/F8 porting pattern: deterministic
# heuristic in, LLM serving out.
# Scale shape: the query-term table is tiny -> broadcast into the
# token-presence table; the only shuffles are the (term, tok)
# co-occurrence agg and the per-term top-k window — both key-partitioned.
_Q93_QUERY = "table join window filter merge"
_Q93_TOPK = 2

_Q93_ORACLE = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, t AS tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE t != ''
),
qt AS (SELECT unnest(string_split('{_Q93_QUERY}', ' ')) AS term),
hits AS (
  SELECT q.term, d.doc_id FROM qt q JOIN dt d ON d.tok = q.term
),
co AS (
  SELECT h.term, d.tok, CAST(COUNT(*) AS BIGINT) AS df_ab
  FROM hits h JOIN dt d ON d.doc_id = h.doc_id
  WHERE d.tok <> h.term AND d.tok NOT IN (SELECT term FROM qt)
  GROUP BY h.term, d.tok
),
ranked AS (
  SELECT term, tok, df_ab,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY df_ab DESC, tok ASC) AS rk
  FROM co
)
SELECT CAST(0 AS INT) AS variant_rank, '' AS base_term, '' AS added_token,
       CAST(0 AS BIGINT) AS df_ab, '{_Q93_QUERY}' AS expanded_query
UNION ALL
SELECT CAST(rk AS INT) AS variant_rank, term AS base_term, tok AS added_token,
       df_ab, '{_Q93_QUERY} ' || tok AS expanded_query
FROM ranked WHERE rk <= {_Q93_TOPK}
"""


@register("q93_query_expansion", oracle=_Q93_ORACLE)
def q93_query_expansion(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    dt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    terms = _Q93_QUERY.split(" ")
    qt = F.broadcast(
        dt.sparkSession.createDataFrame([(t,) for t in terms], "term string")
    )
    hits = qt.join(dt.withColumnRenamed("tok", "term"), "term").select(
        "term", "doc_id"
    )
    co = (
        hits.join(dt, "doc_id")
        .filter(F.col("tok") != F.col("term"))
        .filter(~F.col("tok").isin(terms))
        .groupBy("term", "tok")
        .agg(F.count("*").alias("df_ab"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("df_ab"), F.asc("tok"))
    ranked = (
        co.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _Q93_TOPK)
        .select(
            F.col("rk").cast("int").alias("variant_rank"),
            F.col("term").alias("base_term"),
            F.col("tok").alias("added_token"),
            "df_ab",
            F.concat(F.lit(_Q93_QUERY + " "), F.col("tok")).alias("expanded_query"),
        )
    )
    original = dt.sparkSession.createDataFrame(
        [(0, "", "", 0, _Q93_QUERY)],
        "variant_rank int, base_term string, added_token string, "
        "df_ab long, expanded_query string",
    )
    return original.unionByName(ranked)


# --------------------------------------------------------------------------
# q94: END-TO-END CORPUS CLEAN — the flagship composition: REAL
# extraction (mapInPandas over the interleaved input_hint shape, with
# q68's near-dup injection) -> token-count quality gate -> 48-bit
# simhash signatures -> banded near-dup pairs -> connected components ->
# survivor application, one driver-checked row per extracted document.
# This proves the extraction engine and the dedup family compose without
# a materialization seam: extraction output is checkpointed ONCE
# (checkpoint_memo — at real scale this is the corpus write to the
# lake) and the quality gate, signature table, and final survivor join
# all derive from that single frame; no stage collects to the driver
# (the label-propagation loop's eager label-sized checkpoints are the
# documented q71 discipline). Reference analog: the full
# extract->chunk->hash->dedup chain of
# /root/reference/src/pdf_extractor.py + src/rag/text_processor.py:534.
# Scale shape: the only corpus-payload shuffles are the banded
# signature self-join (key cardinality 6*2^8) and the bigram votes agg;
# the survivor join broadcasts the label frame (clustered nodes only, a
# tiny fraction of the corpus).
_Q94_MIN_TOKENS = 20

_Q94_EXTRACTED = """
  SELECT doc_id, text,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM (
    SELECT doc_id, text FROM documents WHERE n_chars >= 100
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           'xxxxxxxxxx' || SUBSTRING(text, 11) AS text
    FROM documents WHERE doc_id % 11 = 0 AND n_chars >= 100
  )
"""


def _q94_oracle() -> str:
    from sparkextract.queries.dedup2 import simhash_pairs_sql

    good = f"SELECT doc_id, text FROM extracted WHERE n_tokens >= {_Q94_MIN_TOKENS}"
    return f"""
WITH RECURSIVE extracted AS (
  {_Q94_EXTRACTED}
),
{simhash_pairs_sql(good)},
edges AS (
  SELECT left_id AS a, right_id AS b FROM dup_pairs
  UNION ALL
  SELECT right_id, left_id FROM dup_pairs
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id
),
comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
SELECT x.doc_id,
       CAST(x.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN x.n_tokens < {_Q94_MIN_TOKENS} THEN 'dropped_quality'
            WHEN c.component IS NOT NULL AND c.component <> x.doc_id
              THEN 'dropped_dup'
            ELSE 'kept' END AS stage,
       CASE WHEN x.n_tokens < {_Q94_MIN_TOKENS} THEN NULL
            ELSE COALESCE(c.component, x.doc_id) END AS survivor_id
FROM extracted x LEFT JOIN comp c ON c.id = x.doc_id
"""


def _q94_base(spark, sf_dir):
    """Extraction output (doc_id, text, n_tokens), materialized once per
    (session, input) — the corpus-write seam a real pipeline has."""
    from sparkextract.queries.base import checkpoint_memo
    from sparkextract.queries.extraction import wrap_docs
    from sparkextract.spark.job import extract_exploded

    def build():
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        injected = docs.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(
                F.lit("xxxxxxxxxx"), F.expr("substring(text, 11)")
            ).alias("text"),
        )
        spans = extract_exploded(wrap_docs(docs.unionByName(injected)))
        toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        return spans.filter(F.col("kind") == "text").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text",
            F.size(toks).cast("long").alias("n_tokens"),
        )

    return checkpoint_memo(spark, sf_dir, "q94_base", build)


@register("q94_corpus_clean_pipeline", oracle=_q94_oracle())
def q94_corpus_clean_pipeline(spark, sf_dir):
    from sparkextract.queries.base import checkpoint_memo
    from sparkextract.queries.dedup2 import _simhash48_col, simhash_banded_pairs
    from sparkextract.queries.round3 import label_propagation

    base = _q94_base(spark, sf_dir)
    is_quality = F.col("n_tokens") >= _Q94_MIN_TOKENS
    good = base.filter(is_quality).select("doc_id", "text")
    # signature table materialized before the banded self-join (q68
    # lesson); derives from the checkpointed base, not a re-extraction
    sigs = checkpoint_memo(
        spark, sf_dir, "q94_sigs", lambda: _simhash48_col(good)
    )
    labels = checkpoint_memo(
        spark,
        sf_dir,
        "q94_labels",
        lambda: label_propagation(simhash_banded_pairs(sigs)),
    ).select(F.col("id").alias("l_id"), F.col("lbl").alias("component"))
    out = base.join(
        F.broadcast(labels), base["doc_id"] == labels["l_id"], "left"
    )
    stage = (
        F.when(~is_quality, F.lit("dropped_quality"))
        .when(
            F.col("component").isNotNull()
            & (F.col("component") != F.col("doc_id")),
            F.lit("dropped_dup"),
        )
        .otherwise(F.lit("kept"))
    )
    survivor = F.when(~is_quality, F.lit(None).cast("long")).otherwise(
        F.coalesce("component", "doc_id")
    )
    return out.select(
        "doc_id",
        "n_tokens",
        stage.alias("stage"),
        survivor.alias("survivor_id"),
    )


# --------------------------------------------------------------------------
# q95: MANIFEST STATE AFTER CRASH + RESUME — the S9/A9 checkpoint tier
# made driver-visible: a manifest-committed extraction run is killed
# after committing 4 of 8 buckets (fail_after_buckets — data written,
# manifest rows absent), a second run resumes via the J2 broadcast
# anti-join and commits the rest, and the query returns the winning
# manifest rollup per bucket. Reference analog: the SHA-256
# skip-if-ingested resume probe (/root/reference/src/rag/
# rag_pipeline.py:97-105) generalized to per-bucket lineage.
# The bucket function is the engine-portable md5 bucket (bucket_col
# override) so the DuckDB oracle reproduces the assignment exactly;
# span counts are SQL-derivable because the interleaved corpus has the
# q40 passthrough property (1 text span iff n_chars>=100, 1 image_ocr
# span iff doc_id%3==0, never a table span).
# Scale shape: the manifest is <= num_buckets rows per run — every
# join against it broadcasts; the only corpus-sized work is the
# extraction write itself, once per bucket across ALL runs combined
# (that is the point of the resume).
_Q95_BUCKETS = 8
_Q95_FAIL_AFTER = 4

_Q95_ORACLE = f"""
WITH b AS (
  SELECT {md5_bucket_sql("doc_id", _Q95_BUCKETS)} AS doc_id_bucket,
         n_chars, doc_id
  FROM documents
)
SELECT CAST(doc_id_bucket AS INT) AS doc_id_bucket,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS span_count,
       CAST(0 AS BIGINT) AS table_count,
       'done' AS status,
       CAST(CASE WHEN doc_id_bucket < {_Q95_FAIL_AFTER} THEN 1 ELSE 2 END AS INT)
         AS run_seq
FROM b
GROUP BY doc_id_bucket
"""

# one crash+resume simulation per (session, input): the writes land in a
# session-keyed tmp root, so repeated invocations (panel rebuilds, plan
# dumps) re-read the committed manifest instead of re-running the job
_Q95_DONE: set[tuple[str, str]] = set()


def _q95_root(spark, sf_dir: str) -> str:
    import hashlib
    import tempfile

    key = hashlib.md5(
        (spark.sparkContext.applicationId + "|" + sf_dir).encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sparkextract_q95_{key}")


@register("q95_manifest_resume_state", oracle=_Q95_ORACLE)
def q95_manifest_resume_state(spark, sf_dir):
    import shutil

    from sparkextract.queries.extraction import interleaved_docs
    from sparkextract.spark.manifest import read_manifest, run_extraction_job

    root = _q95_root(spark, sf_dir)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key not in _Q95_DONE:
        shutil.rmtree(root, ignore_errors=True)
        docs = interleaved_docs(spark, sf_dir)
        bucket = md5_bucket(F.col("doc_id"), _Q95_BUCKETS)
        run_extraction_job(
            spark, docs, root, run_id="r1", num_buckets=_Q95_BUCKETS,
            fail_after_buckets=_Q95_FAIL_AFTER, bucket_col=bucket,
        )
        run_extraction_job(
            spark, docs, root, run_id="r2", num_buckets=_Q95_BUCKETS,
            bucket_col=bucket,
        )
        _Q95_DONE.add(memo_key)
    m = read_manifest(spark, root).filter(F.col("status") == "done")
    return m.select(
        "doc_id_bucket",
        "doc_count",
        "span_count",
        "table_count",
        "status",
        F.when(F.col("job_run_id") == "r1", 1).otherwise(2).cast("int").alias(
            "run_seq"
        ),
    )
