"""Round-5 continuation wave 5: chunking robustness, data-selection
frontiers, graded retrieval eval, and classifier calibration.

q154 — CONTENT-DEFINED CHUNKING + SHIFT-INVARIANCE AUDIT. Fixed-size
blocks (q96's grain) lose ALL dedup alignment after a single prefix
insertion; content-defined chunking (CDC — the rolling-hash boundary
rule behind rsync / LBFS / data-dedup stores) re-synchronizes because
a cut depends only on a LOCAL window of content. Rule used here, at
token grain so both engines agree byte-for-byte: cut AFTER token i iff
md5_bucket(window) == 0 where window is the concatenation of tokens
i-2..i (w=3, boundary probability 1/4, expected chunk ~4 tokens). The
audit synthesizes a shifted twin of every document (one header token
prepended) and chunks BOTH variants BOTH ways (cdc / fixed 8-token
blocks); the output compares chunk-hash multisets across variants per
method: CDC re-syncs after at most w tokens (shared_cdc ~ n_cdc),
fixed blocks never re-align (shared_fix == 0 for every doc whose
length isn't congruent to the insertion — in practice 0). Reference
analog: the fixed-size chunker (/root/reference/src/rag/
text_processor.py:340-420) — this is the dedup-stable alternative a
100 TB store would use.
Scale shape: variant/method expansion is a doc-local explode (map
side); the ONLY shuffles are the (doc_id, variant)-partitioned token
window (doc-bounded partitions, never content-keyed) and the chunk
groupBy — both keyed by doc_id, so a hot boilerplate chunk never
concentrates (the q96/q99 de-skew lesson applied from the start).

q155 — PARETO-FRONTIER DATA SELECTION. Data-selection recipes trade
off multiple per-doc merits (here: lexical diversity x = #distinct
tokens vs raw length y = n_chars); the docs worth human inspection are
the NON-DOMINATED ones — no other doc in the same language is >= on
both axes and > on one. The naive frontier is an all-pairs dominance
test; the scalable form used here reduces the corpus FIRST with a
map-side-combinable groupBy(lang, x) -> (max y, count), then runs one
suffix-max window over the tiny (lang, x) grain: a group is on the
frontier iff its max-y exceeds every max-y at strictly larger x.
Integer-only — zero IEEE operations.
Scale shape: one partial-agg shuffle at the (lang, x) grain (x is
bounded by the per-doc distinct-token count, a few hundred values);
the window runs on that provably tiny table (the q137/q150 documented
tiny-grain exception).

q156 — nDCG@k GRADED RETRIEVAL EVAL. q125/q127 rank documents; the
standard graded-relevance metric for a ranking is normalized
discounted cumulative gain: DCG = sum (2^rel - 1) / log2(rank + 1)
over the top k, normalized by the ideal reordering. Relevance grades
are deterministic (rel = 3 - md5_bucket(doc_id, 4), the q107 synthetic
ground-truth protocol); the ranking under eval is q125's BM25 top-5.
IDCG here is the ideal reordering of the RETRIEVED set (the "local"
nDCG variant — no corpus-wide relevance scan; documented). Numeric
discipline: gains are exact integers {0,1,3,7}; each per-rank
contribution gain / (LN(rank+1)/LN(2)) is ROUND(...,6)-ed and summed
as DECIMAL(18,6) (the q125 discipline — never a float accumulation);
ndcg_u is ONE final snapped division. idcg = 0 (nothing relevant
retrieved, nothing relevant available) reports the vacuous 1_000_000.
Scale shape: everything downstream of q125 runs on its <= |Q|*k row
output; the per-query ideal reorder is a window over <= k rows.

q157 — CALIBRATION / EXPECTED CALIBRATION ERROR. q137 measures
DISCRIMINATION (AUC); deployment also needs CALIBRATION — does a
predicted probability of 0.8 keep 80% good docs? Binned ECE over the
SAME <= 81-bin logit histogram as q137 (zero extra corpus passes):
per bin, confidence is the sigmoid of the BIN CENTER (the binned-ECE
approximation, documented — avoids a per-row exp) and accuracy is the
bin's positive rate (label: lang = 'en', q137's convention); both are
snapped to micro-units, the per-bin gap |acc_u - conf_u| is then an
exact integer, and ECE_u = round(sum(gap_u * n_b) / N) is ONE final
snapped division.
Scale shape: one map-side-combinable histogram aggregate (shared with
q137's builder); everything else runs on <= 81 rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkextract.queries.base import (
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)
from sparkextract.queries.round5b import _Q125_ORACLE, q125_bm25_topk
from sparkextract.queries.round5d import _Q137_HIST_SQL, _q137_hist

# --------------------------------------------------------------------------
# q154: content-defined chunking + shift-invariance audit

_Q154_W_BUCKETS = 4   # boundary iff md5_bucket(window) == 0 -> p = 1/4
_Q154_FIX_B = 8       # fixed-block comparison grain (tokens)
_Q154_SHIFT_TOK = "zq"  # deterministic prepended header token

# window = lag2 || ' ' || lag1 || ' ' || token with '' for missing lags
# (head-of-doc windows are partial on purpose: CDC re-syncs once w full
# tokens of context are shared again, which is the property under test)
_Q154_ORACLE = f"""
WITH var AS (
  SELECT doc_id, 'orig' AS variant, text AS t FROM documents
  UNION ALL
  SELECT doc_id, 'shift' AS variant, '{_Q154_SHIFT_TOK} ' || text FROM documents
), tok AS (
  SELECT doc_id, variant,
         unnest(string_split(t, ' ')) AS token,
         generate_subscripts(string_split(t, ' '), 1) AS pos
  FROM var
), wn AS (
  SELECT doc_id, variant, pos, token,
         CASE WHEN {md5_bucket_sql(
             "COALESCE(LAG(token, 2) OVER w, '') || ' ' || "
             "COALESCE(LAG(token, 1) OVER w, '') || ' ' || token",
             _Q154_W_BUCKETS)} = 0 THEN 1 ELSE 0 END AS bnd
  FROM tok
  WINDOW w AS (PARTITION BY doc_id, variant ORDER BY pos)
), idxed AS (
  SELECT doc_id, variant, pos, token,
         COALESCE(SUM(bnd) OVER (PARTITION BY doc_id, variant ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cdc_idx,
         (pos - 1) // {_Q154_FIX_B} AS fix_idx
  FROM wn
), grain AS (
  SELECT doc_id, variant, 'cdc' AS method, cdc_idx AS idx, pos, token FROM idxed
  UNION ALL
  SELECT doc_id, variant, 'fix' AS method, fix_idx AS idx, pos, token FROM idxed
), chunks AS (
  SELECT doc_id, variant, method,
         md5(string_agg(token, ' ' ORDER BY pos)) AS h
  FROM grain GROUP BY doc_id, variant, method, idx
), per_h AS (
  SELECT doc_id, method, h,
         CAST(SUM(CASE WHEN variant = 'orig' THEN 1 ELSE 0 END) AS BIGINT) AS co,
         CAST(SUM(CASE WHEN variant = 'shift' THEN 1 ELSE 0 END) AS BIGINT) AS cs
  FROM chunks GROUP BY doc_id, method, h
), per_m AS (
  SELECT doc_id, method,
         CAST(SUM(co) AS BIGINT) AS n_chunks,
         CAST(SUM(LEAST(co, cs)) AS BIGINT) AS shared
  FROM per_h GROUP BY doc_id, method
)
SELECT doc_id,
       CAST(SUM(CASE WHEN method = 'cdc' THEN n_chunks ELSE 0 END) AS BIGINT)
         AS n_cdc,
       CAST(SUM(CASE WHEN method = 'cdc' THEN shared ELSE 0 END) AS BIGINT)
         AS shared_cdc,
       CAST(SUM(CASE WHEN method = 'fix' THEN n_chunks ELSE 0 END) AS BIGINT)
         AS n_fix,
       CAST(SUM(CASE WHEN method = 'fix' THEN shared ELSE 0 END) AS BIGINT)
         AS shared_fix
FROM per_m GROUP BY doc_id
"""


@register("q154_cdc_chunking", oracle=_Q154_ORACLE)
def q154_cdc_chunking(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    var = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("orig").alias("variant"), F.col("text").alias("t")
                ),
                F.struct(
                    F.lit("shift").alias("variant"),
                    F.concat(
                        F.lit(_Q154_SHIFT_TOK + " "), F.col("text")
                    ).alias("t"),
                ),
            )
        ).alias("v"),
    ).select("doc_id", "v.variant", "v.t")
    tok = var.select(
        "doc_id",
        "variant",
        F.posexplode(F.split("t", " ")).alias("p0", "token"),
    ).select(
        "doc_id", "variant", (F.col("p0") + 1).alias("pos"), "token"
    )
    # doc-keyed window: partitions are bounded by doc length, never by
    # content — a hot chunk hash cannot concentrate here
    w = Window.partitionBy("doc_id", "variant").orderBy("pos")
    wnd = F.concat(
        F.coalesce(F.lag("token", 2).over(w), F.lit("")),
        F.lit(" "),
        F.coalesce(F.lag("token", 1).over(w), F.lit("")),
        F.lit(" "),
        F.col("token"),
    )
    bnd = F.when(md5_bucket(wnd, _Q154_W_BUCKETS) == 0, 1).otherwise(0)
    run = F.coalesce(
        F.sum("bnd").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    idxed = (
        tok.withColumn("bnd", bnd)
        .withColumn("cdc_idx", run)
        .withColumn("fix_idx", F.expr(f"(pos - 1) div {_Q154_FIX_B}"))
    )
    grain = idxed.select(
        "doc_id",
        "variant",
        "pos",
        "token",
        F.explode(
            F.array(
                F.struct(
                    F.lit("cdc").alias("method"),
                    F.col("cdc_idx").cast("long").alias("idx"),
                ),
                F.struct(
                    F.lit("fix").alias("method"),
                    F.col("fix_idx").cast("long").alias("idx"),
                ),
            )
        ).alias("m"),
    ).select("doc_id", "variant", "pos", "token", "m.method", "m.idx")
    chunks = grain.groupBy("doc_id", "variant", "method", "idx").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda x: x["token"],
                ),
                " ",
            )
        ).alias("h")
    )
    per_h = chunks.groupBy("doc_id", "method", "h").agg(
        F.sum(F.when(F.col("variant") == "orig", 1).otherwise(0))
        .cast("long")
        .alias("co"),
        F.sum(F.when(F.col("variant") == "shift", 1).otherwise(0))
        .cast("long")
        .alias("cs"),
    )
    per_m = per_h.groupBy("doc_id", "method").agg(
        F.sum("co").cast("long").alias("n_chunks"),
        F.sum(F.least("co", "cs")).cast("long").alias("shared"),
    )
    m_is = lambda v: F.col("method") == v  # noqa: E731
    return per_m.groupBy("doc_id").agg(
        F.sum(F.when(m_is("cdc"), F.col("n_chunks")).otherwise(0))
        .cast("long")
        .alias("n_cdc"),
        F.sum(F.when(m_is("cdc"), F.col("shared")).otherwise(0))
        .cast("long")
        .alias("shared_cdc"),
        F.sum(F.when(m_is("fix"), F.col("n_chunks")).otherwise(0))
        .cast("long")
        .alias("n_fix"),
        F.sum(F.when(m_is("fix"), F.col("shared")).otherwise(0))
        .cast("long")
        .alias("shared_fix"),
    )


# --------------------------------------------------------------------------
# q155: Pareto-frontier data selection over (distinct tokens, length)

_Q155_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CAST(LENGTH(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS x,
         CAST(n_chars AS BIGINT) AS y
  FROM documents
), grp AS (
  SELECT lang, x,
         CAST(MAX(y) AS BIGINT) AS y_max,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM per_doc GROUP BY lang, x
)
SELECT lang, x, y_max, n_docs,
       (y_max > COALESCE(MAX(y_max) OVER (PARTITION BY lang ORDER BY x ASC
          RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), -1))
         AS frontier
FROM grp
"""


@register("q155_pareto_frontier", oracle=_Q155_ORACLE)
def q155_pareto_frontier(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    grp = per_doc.groupBy("lang", "x").agg(
        F.max("y").cast("long").alias("y_max"),
        F.count("*").cast("long").alias("n_docs"),
    )
    # suffix max over the tiny (lang, x) grain: all rows with strictly
    # larger x (the documented tiny-grain window exception)
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("x").asc())
        .rangeBetween(1, Window.unboundedFollowing)
    )
    return grp.select(
        "lang",
        "x",
        "y_max",
        "n_docs",
        (F.col("y_max") > F.coalesce(F.max("y_max").over(w), F.lit(-1))).alias(
            "frontier"
        ),
    )


# --------------------------------------------------------------------------
# q156: nDCG@k over the q125 BM25 ranking

_Q156_REL_BUCKETS = 4  # rel = 3 - md5_bucket(doc_id, 4) in {0,1,2,3}

_Q156_ORACLE = f"""
WITH ranked AS ({_Q125_ORACLE}),
graded AS (
  SELECT query_id, rnk, doc_id,
         CAST(3 - ({md5_bucket_sql("doc_id", _Q156_REL_BUCKETS)}) AS BIGINT)
           AS rel
  FROM ranked
), gains AS (
  SELECT query_id, rnk, doc_id, rel,
         CAST(CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
              ELSE 7 END AS BIGINT) AS gain
  FROM graded
), contrib AS (
  SELECT query_id, rel, gain,
         CAST(ROUND(gain / (LN(CAST(rnk + 1 AS DOUBLE)) / LN(CAST(2 AS DOUBLE))), 6)
              AS DECIMAL(18,6)) AS dc,
         CAST(ROUND(gain / (LN(CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY gain DESC, rnk ASC) + 1 AS DOUBLE))
              / LN(CAST(2 AS DOUBLE))), 6) AS DECIMAL(18,6)) AS ic
  FROM gains
)
SELECT query_id,
       CAST(SUM(dc) AS DOUBLE) AS dcg,
       CAST(SUM(ic) AS DOUBLE) AS idcg,
       CAST(CASE WHEN SUM(ic) = 0 THEN 1000000
            ELSE ROUND(CAST(SUM(dc) AS DOUBLE) * 1000000.0
                       / CAST(SUM(ic) AS DOUBLE)) END AS BIGINT) AS ndcg_u,
       CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
FROM contrib GROUP BY query_id
"""


@register("q156_ndcg_eval", oracle=_Q156_ORACLE)
def q156_ndcg_eval(spark, sf_dir):
    ranked = q125_bm25_topk(spark, sf_dir).select("query_id", "rnk", "doc_id")
    rel = (
        F.lit(3) - md5_bucket(F.col("doc_id"), _Q156_REL_BUCKETS)
    ).cast("long")
    gain = (
        F.when(F.col("rel") == 0, 0)
        .when(F.col("rel") == 1, 1)
        .when(F.col("rel") == 2, 3)
        .otherwise(7)
        .cast("long")
    )
    gains = ranked.withColumn("rel", rel).withColumn("gain", gain)
    # ideal position: reorder the <= k retrieved rows by gain desc
    # (rnk asc tie-break), per query — a window over <= k rows
    wi = Window.partitionBy("query_id").orderBy(
        F.desc("gain"), F.asc("rnk")
    )
    log2 = lambda c: F.log(c.cast("double")) / F.log(F.lit(2.0))  # noqa: E731
    contrib = gains.withColumn("ipos", F.row_number().over(wi)).select(
        "query_id",
        "rel",
        F.round(F.col("gain") / log2(F.col("rnk") + 1), 6)
        .cast("decimal(18,6)")
        .alias("dc"),
        F.round(F.col("gain") / log2(F.col("ipos") + 1), 6)
        .cast("decimal(18,6)")
        .alias("ic"),
    )
    dc, ic = F.sum("dc"), F.sum("ic")
    return contrib.groupBy("query_id").agg(
        dc.cast("double").alias("dcg"),
        ic.cast("double").alias("idcg"),
        F.when(ic == 0, F.lit(1000000))
        .otherwise(
            F.round(dc.cast("double") * F.lit(1000000.0) / ic.cast("double"))
        )
        .cast("long")
        .alias("ndcg_u"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rel"),
    )


# --------------------------------------------------------------------------
# q157: binned expected calibration error over the q137 histogram

_Q157_BIN_U = 500_000  # = _Q137_BIN_U; bin center sigmoid arg is
# (b + 0.5) * 0.5 in logits

_Q157_ORACLE = f"""
WITH bkt AS ({_Q137_HIST_SQL}),
per_bin AS (
  SELECT b,
         CAST(pos_b + neg_b AS BIGINT) AS n_b,
         CAST(pos_b AS BIGINT) AS pos_b,
         CAST(ROUND(1000000.0 / (1.0 + EXP(-((b + 0.5) * 0.5)))) AS BIGINT)
           AS conf_u,
         CAST(ROUND(1000000.0 * pos_b / (pos_b + neg_b)) AS BIGINT) AS acc_u
  FROM bkt
)
SELECT b, n_b, pos_b, conf_u, acc_u,
       CAST(ABS(acc_u - conf_u) AS BIGINT) AS gap_u,
       CAST(ROUND(CAST(SUM(ABS(acc_u - conf_u) * n_b) OVER () AS DOUBLE)
                  / SUM(n_b) OVER ()) AS BIGINT) AS ece_u
FROM per_bin
"""


@register("q157_calibration_ece", oracle=_Q157_ORACLE)
def q157_calibration_ece(spark, sf_dir):
    bkt = _q137_hist(spark, sf_dir)
    n_b = (F.col("pos_b") + F.col("neg_b")).cast("long")
    conf_u = (
        F.round(
            F.lit(1000000.0)
            / (F.lit(1.0) + F.exp(-((F.col("b") + F.lit(0.5)) * F.lit(0.5))))
        )
        .cast("long")
    )
    acc_u = (
        F.round(F.lit(1000000.0) * F.col("pos_b") / (F.col("pos_b") + F.col("neg_b")))
        .cast("long")
    )
    per_bin = bkt.select(
        "b",
        n_b.alias("n_b"),
        F.col("pos_b").cast("long").alias("pos_b"),
        conf_u.alias("conf_u"),
        acc_u.alias("acc_u"),
    )
    # <= 81 rows: the documented tiny-grain exception
    w = Window.partitionBy()
    gap = F.abs(F.col("acc_u") - F.col("conf_u"))
    return per_bin.select(
        "b",
        "n_b",
        "pos_b",
        "conf_u",
        "acc_u",
        gap.cast("long").alias("gap_u"),
        F.round(
            F.sum(gap * F.col("n_b")).over(w).cast("double")
            / F.sum("n_b").over(w)
        )
        .cast("long")
        .alias("ece_u"),
    )
