"""Round-5 continuation wave 20: vocabulary scaling law and a real
smoothed language model.

q188 — HEAPS'-LAW VOCABULARY GROWTH (Heaps 1978): V(N) ~ K*N^beta.
Complements q186's point estimate of total vocabulary with the GROWTH
CURVE a crawl-scheduling decision needs: how fast does new vocabulary
arrive as the corpus doubles? Documents are split into 10 deterministic
md5 buckets treated as an ingestion order; a token type's first-seen
bucket is min(bucket); the cumulative (tokens, types) curve is a
running sum over the 10-row bucket grain; the local Heaps exponent
between consecutive buckets is beta = dln(V)/dln(N) (ROUND 6; 0.0 for
the first bucket, where no previous point exists).
Reference intent: corpus word statistics (text_processor.py counts)
lifted to the scaling-law form.

Scale shape: token instances are never joined — first-seen is a
token-grain mergeable MIN, bucket token totals a 10-group mergeable
COUNT; all windows run over the 10-row bucket frame. One shuffle of
vocab-sized data, one of 10 rows.

q189 — INTERPOLATED KNESER-NEY BIGRAM LM (Kneser & Ney 1995; Chen &
Goodman 1999) — the standard n-gram smoothing, replacing q87/q133's
add-one reference-slice models with the real thing: P(b|a) =
(c(a,b) - D)/c(a) + (D * N1+(a.)/c(a)) * N1+(.b)/B, with discount
D = 0.75, where N1+(a.) = distinct continuations of a, N1+(.b) =
distinct left-contexts of b (the continuation count that makes KN
famous), and B = total distinct bigram types. The LM is trained on the
corpus itself, so every scored bigram has c >= 1 and no OOV branch is
needed. Per-document cross-entropy H = -sum ln P / n_bigrams over the
doc's bigram INSTANCES (with multiplicity); each ln P term is
ROUND(,9)-frozen as DECIMAL(18,9) so the sum is exact and
partition-order-independent (the q130 discipline); H is ROUND(,6).
Reference intent: the reference gates extracted text with flat
heuristics (text_processor.py meaningful-text predicate); CCNet-style
pipelines gate with an LM — this is that gate with correct smoothing.

Scale shape: all four LM statistics are mergeable aggregations on the
(a, b) / (a) / (b) grains (map-side combine absorbs hot-bigram skew);
scoring is ONE equi-join of doc-bigram instances against the bigram LM
table on (a, b) — vocabulary-keyed, no broadcast assumption — followed
by a doc-grain mergeable agg. The unigram-side statistics join into
the LM table on (a) and (b) before the scoring join, so the corpus-
sized instance table is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import (
    checkpoint_memo,
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

# ---------------------------------------------------------------------
# q188
_Q188_BUCKETS = 10

_Q188_ORACLE = f"""
WITH d AS (
  SELECT CAST({md5_bucket_sql("doc_id", _Q188_BUCKETS)} AS BIGINT) AS b, text
  FROM documents
),
toks AS (
  SELECT b, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
  FROM d
),
per_bucket AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_toks FROM toks GROUP BY b
),
first_seen AS (
  SELECT t, MIN(b) AS fb FROM toks GROUP BY t
),
vnew AS (
  SELECT fb AS b, CAST(COUNT(*) AS BIGINT) AS v_new FROM first_seen GROUP BY fb
),
cum AS (
  SELECT pb.b,
         CAST(SUM(pb.n_toks) OVER (ORDER BY pb.b) AS BIGINT) AS n_cum,
         CAST(SUM(COALESCE(v.v_new, 0)) OVER (ORDER BY pb.b) AS BIGINT) AS v_cum
  FROM per_bucket pb LEFT JOIN vnew v ON v.b = pb.b
),
lagged AS (
  SELECT b, n_cum, v_cum,
         LAG(n_cum) OVER (ORDER BY b) AS pn,
         LAG(v_cum) OVER (ORDER BY b) AS pv
  FROM cum
)
SELECT b AS bucket, n_cum, v_cum,
       ROUND(CASE WHEN pn IS NULL OR n_cum = pn THEN 0.0
             ELSE (ln(CAST(v_cum AS DOUBLE)) - ln(CAST(pv AS DOUBLE)))
                  / (ln(CAST(n_cum AS DOUBLE)) - ln(CAST(pn AS DOUBLE)))
             END, 6) AS beta
FROM lagged
"""


@register("q188_heaps_law", oracle=_Q188_ORACLE)
def q188_heaps_law(spark, sf_dir):
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            md5_bucket(F.col("doc_id"), _Q188_BUCKETS).alias("b"),
            F.explode(F.split("text", " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    per_bucket = toks.groupBy("b").agg(F.count("*").cast("long").alias("n_toks"))
    vnew = (
        toks.groupBy("t")
        .agg(F.min("b").alias("fb"))
        .groupBy(F.col("fb").alias("b"))
        .agg(F.count("*").cast("long").alias("v_new"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        per_bucket.join(vnew, "b", "left")
        .select(
            "b",
            F.sum("n_toks").over(w).cast("long").alias("n_cum"),
            F.sum(F.coalesce("v_new", F.lit(0))).over(w).cast("long").alias("v_cum"),
        )
    )
    wl = Window.orderBy("b")
    lagged = cum.select(
        "b",
        "n_cum",
        "v_cum",
        F.lag("n_cum").over(wl).alias("pn"),
        F.lag("v_cum").over(wl).alias("pv"),
    )
    beta = F.when(
        F.col("pn").isNull() | (F.col("n_cum") == F.col("pn")), F.lit(0.0)
    ).otherwise(
        (F.log(F.col("v_cum").cast("double")) - F.log(F.col("pv").cast("double")))
        / (F.log(F.col("n_cum").cast("double")) - F.log(F.col("pn").cast("double")))
    )
    return lagged.select(
        F.col("b").alias("bucket"),
        "n_cum",
        "v_cum",
        F.round(beta, 6).alias("beta"),
    )


# ---------------------------------------------------------------------
# q189
_Q189_D = 0.75  # absolute discount (Chen & Goodman's fixed-D variant)

_Q189_ORACLE = f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
inst AS (
  SELECT doc_id, w[i] AS a, w[i + 1] AS b
  FROM words,
       LATERAL (SELECT unnest(range(1, GREATEST(len(w) - 1, 0) + 1)) AS i)
),
big AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM inst GROUP BY a, b
),
left_stats AS (
  SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a,
         CAST(COUNT(*) AS BIGINT) AS n1f
  FROM big GROUP BY a
),
right_stats AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n1r FROM big GROUP BY b
),
bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big),
lm AS (
  SELECT g.a, g.b,
         (CAST(g.c_ab AS DOUBLE) - {_Q189_D}) / CAST(l.c_a AS DOUBLE)
         + ({_Q189_D} * CAST(l.n1f AS DOUBLE) / CAST(l.c_a AS DOUBLE))
           * (CAST(r.n1r AS DOUBLE) / CAST(bt.n_types AS DOUBLE)) AS p
  FROM big g
  JOIN left_stats l ON l.a = g.a
  JOIN right_stats r ON r.b = g.b
  CROSS JOIN bt
)
SELECT i.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-CAST(SUM(CAST(ROUND(ln(lm.p), 9) AS DECIMAL(18,9))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS xent
FROM inst i
JOIN lm ON lm.a = i.a AND lm.b = i.b
GROUP BY i.doc_id
"""


def _q189_inst(spark, sf_dir):
    words = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("w"),
    )
    return words.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("w", 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice("w", 2, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("ab"),
    ).select("doc_id", F.col("ab.a").alias("a"), F.col("ab.b").alias("b"))


@register("q189_kneser_ney_lm", oracle=_Q189_ORACLE)
def q189_kneser_ney_lm(spark, sf_dir):
    inst = _q189_inst(spark, sf_dir)
    # the bigram count table feeds FOUR sibling subtrees (left stats,
    # right stats, the type total, and the LM join); without eager
    # materialization each one re-scans and re-explodes the corpus
    # (PLANS.md showed 5 scans). It is vocab^2-bounded, far smaller
    # than the corpus — the exact case checkpoint_memo exists for.
    big = checkpoint_memo(
        spark,
        sf_dir,
        "q189_bigrams",
        lambda: _q189_inst(spark, sf_dir)
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("c_ab")),
    )
    left_stats = big.groupBy("a").agg(
        F.sum("c_ab").cast("long").alias("c_a"),
        F.count("*").cast("long").alias("n1f"),
    )
    right_stats = big.groupBy("b").agg(F.count("*").cast("long").alias("n1r"))
    bt = big.agg(F.count("*").cast("long").alias("n_types"))
    d = F.lit(_Q189_D)
    p = (F.col("c_ab").cast("double") - d) / F.col("c_a").cast("double") + (
        d * F.col("n1f").cast("double") / F.col("c_a").cast("double")
    ) * (F.col("n1r").cast("double") / F.col("n_types").cast("double"))
    lm = (
        big.join(left_stats, "a")
        .join(right_stats, "b")
        .crossJoin(F.broadcast(bt))
        .select("a", "b", p.alias("p"))
    )
    return (
        inst.join(lm, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.round(F.log("p"), 9).cast("decimal(18,9)")).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("xent"),
        )
    )
