"""Round-5 continuation wave 22: data attribution and distribution
drift testing — completing the corpus-statistics suite of q190/q191.

q192 — LEAVE-ONE-SOURCE-OUT INFLUENCE (ablation-style data
attribution; the group-level form of influence functions / datamodels
that large-corpus teams actually run, cf. Ilyas et al. 2022). For the
corpus statistic mean(n_chars): how much does each SOURCE move it?
influence(s) = full_mean - mean_without(s), computed for every source
in ONE pass: per-source (n_i, sum_i) mergeable aggs + one broadcast
global (N, S); the leave-one-out mean is (S - s_i)/(N - n_i) — exact
BIGINT sums, one IEEE division each, ROUND(,6)-frozen. Rank by
absolute influence (tie-break source) names the sources that dominate
the statistic — the audit run before deciding what to re-crawl or
drop. Complements q191 (how UNCERTAIN is the number) and q140
(jackknife over md5 folds — random groups; this is the semantically
meaningful grouping).

Scale shape: one mergeable groupBy(source) + a 1-row broadcast; the
ranking window runs over |sources| rows. No corpus-sized join, window,
or second scan.

q193 — CHI-SQUARE HOMOGENEITY DRIFT TEST (Pearson 1900) between two
md5 halves of the corpus: is the language distribution of shard A
statistically the same as shard B? The drift gate a continuously-
ingesting pipeline runs per snapshot (q114 measures token drift
MAGNITUDE; this attaches the classical TEST statistic). Observed cell
counts o(lang, half) and margin products e = row_total * col_total / N
are exact BIGINT-derived; each cell contribution (o - e)^2 / e is a
fixed IEEE sequence on exact integers, ROUND(,6)-frozen per lang, with
the global statistic and degrees of freedom (|langs| - 1) repeated on
every row (ROUND(,6) after an exact DECIMAL(18,6) sum of the frozen
per-lang terms, so the total is partition-order-independent).

Scale shape: groupBy(lang, half) mergeable counts -> lang-grain
pivot agg -> 1-row broadcast of margins; everything after the first
shuffle operates on |langs| rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, md5_bucket, md5_bucket_sql, register

# ---------------------------------------------------------------------
# q192
_Q192_ORACLE = """
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source
),
g AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
         CAST(SUM(sum_chars) AS BIGINT) AS s_total
  FROM per_source
),
inf AS (
  SELECT p.source, p.n_docs, p.sum_chars,
         ROUND(CAST(g.s_total AS DOUBLE) / CAST(g.n_total AS DOUBLE), 6)
           AS full_mean,
         ROUND(CASE WHEN g.n_total = p.n_docs THEN 0.0
               ELSE CAST(g.s_total - p.sum_chars AS DOUBLE)
                    / CAST(g.n_total - p.n_docs AS DOUBLE) END, 6) AS loo_mean,
         ROUND(CASE WHEN g.n_total = p.n_docs THEN 0.0
               ELSE CAST(g.s_total AS DOUBLE) / CAST(g.n_total AS DOUBLE)
                    - CAST(g.s_total - p.sum_chars AS DOUBLE)
                      / CAST(g.n_total - p.n_docs AS DOUBLE) END, 6) AS influence
  FROM per_source p CROSS JOIN g
)
SELECT source, n_docs, sum_chars, full_mean, loo_mean, influence,
       CAST(ROW_NUMBER() OVER (ORDER BY ABS(influence) DESC, source ASC)
            AS BIGINT) AS influence_rank
FROM inf
"""


@register("q192_loo_influence", oracle=_Q192_ORACLE)
def q192_loo_influence(spark, sf_dir):
    per_source = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )
    g = per_source.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.sum("sum_chars").cast("long").alias("s_total"),
    )
    j = per_source.crossJoin(F.broadcast(g))
    full_mean_raw = F.col("s_total").cast("double") / F.col("n_total").cast("double")
    loo_raw = (F.col("s_total") - F.col("sum_chars")).cast("double") / (
        F.col("n_total") - F.col("n_docs")
    ).cast("double")
    degenerate = F.col("n_total") == F.col("n_docs")
    inf = j.select(
        "source",
        "n_docs",
        "sum_chars",
        F.round(full_mean_raw, 6).alias("full_mean"),
        F.round(F.when(degenerate, F.lit(0.0)).otherwise(loo_raw), 6).alias("loo_mean"),
        F.round(
            F.when(degenerate, F.lit(0.0)).otherwise(full_mean_raw - loo_raw), 6
        ).alias("influence"),
    )
    w = Window.orderBy(F.abs(F.col("influence")).desc(), F.asc("source"))
    return inf.withColumn("influence_rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------
# q193
_Q193_ORACLE = f"""
WITH d AS (
  SELECT lang, CAST({md5_bucket_sql("doc_id", 2)} AS BIGINT) AS half
  FROM documents
),
cells AS (
  SELECT lang,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o0,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o1
  FROM d GROUP BY lang
),
g AS (
  SELECT CAST(SUM(o0) AS BIGINT) AS c0,
         CAST(SUM(o1) AS BIGINT) AS c1,
         CAST(SUM(o0) + SUM(o1) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM cells
),
per_lang AS (
  SELECT c.lang, c.o0, c.o1,
         ROUND(CAST((c.o0 + c.o1) * g.c0 AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS e0,
         ROUND(CAST((c.o0 + c.o1) * g.c1 AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS e1,
         ROUND(
           (CAST(c.o0 AS DOUBLE)
              - CAST((c.o0 + c.o1) * g.c0 AS DOUBLE) / CAST(g.n AS DOUBLE))
           * (CAST(c.o0 AS DOUBLE)
              - CAST((c.o0 + c.o1) * g.c0 AS DOUBLE) / CAST(g.n AS DOUBLE))
           / (CAST((c.o0 + c.o1) * g.c0 AS DOUBLE) / CAST(g.n AS DOUBLE))
           + (CAST(c.o1 AS DOUBLE)
              - CAST((c.o0 + c.o1) * g.c1 AS DOUBLE) / CAST(g.n AS DOUBLE))
           * (CAST(c.o1 AS DOUBLE)
              - CAST((c.o0 + c.o1) * g.c1 AS DOUBLE) / CAST(g.n AS DOUBLE))
           / (CAST((c.o0 + c.o1) * g.c1 AS DOUBLE) / CAST(g.n AS DOUBLE)), 6)
           AS chi2_lang,
         g.n_langs
  FROM cells c CROSS JOIN g
),
tot AS (
  SELECT ROUND(CAST(SUM(CAST(chi2_lang AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS chi2_total
  FROM per_lang
)
SELECT p.lang, p.o0, p.o1, p.e0, p.e1, p.chi2_lang,
       t.chi2_total, CAST(p.n_langs - 1 AS BIGINT) AS dof
FROM per_lang p CROSS JOIN tot t
"""


@register("q193_chi_square_drift", oracle=_Q193_ORACLE)
def q193_chi_square_drift(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "lang", md5_bucket(F.col("doc_id"), 2).alias("half")
    )
    cells = d.groupBy("lang").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("o0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("o1"),
    )
    g = cells.agg(
        F.sum("o0").cast("long").alias("c0"),
        F.sum("o1").cast("long").alias("c1"),
        (F.sum("o0") + F.sum("o1")).cast("long").alias("n"),
        F.count("*").cast("long").alias("n_langs"),
    )
    j = cells.crossJoin(F.broadcast(g))
    rt = (F.col("o0") + F.col("o1")).cast("long")
    e0 = (rt * F.col("c0")).cast("double") / F.col("n").cast("double")
    e1 = (rt * F.col("c1")).cast("double") / F.col("n").cast("double")
    chi2 = (F.col("o0").cast("double") - e0) * (F.col("o0").cast("double") - e0) / e0 + (
        F.col("o1").cast("double") - e1
    ) * (F.col("o1").cast("double") - e1) / e1
    per_lang = j.select(
        "lang",
        "o0",
        "o1",
        F.round(e0, 6).alias("e0"),
        F.round(e1, 6).alias("e1"),
        F.round(chi2, 6).alias("chi2_lang"),
        "n_langs",
    )
    tot = per_lang.agg(
        F.round(
            F.sum(F.col("chi2_lang").cast("decimal(18,6)")).cast("double"), 6
        ).alias("chi2_total")
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "o0",
        "o1",
        "e0",
        "e1",
        "chi2_lang",
        "chi2_total",
        (F.col("n_langs") - 1).cast("long").alias("dof"),
    )
