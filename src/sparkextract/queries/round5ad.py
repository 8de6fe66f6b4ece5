"""Round-5 continuation wave 28: robust statistics — the outlier-
resistant summary layer a corpus dashboard needs (classical means and
q60's raw length distribution both move arbitrarily far under a
handful of pathological documents; these do not).

q204 — WINSORIZED + TRIMMED MEANS (Tukey; Dixon 1960). Per language:
the exact p5/p95 nearest-rank fences from the VALUE-grain CDF (the
q197/q200 technique — never a corpus sort), then in one more mergeable
pass over the value grain: the 5% WINSORIZED mean (values beyond a
fence are CLAMPED to it) and the 5% TRIMMED mean (values beyond a
fence are DROPPED). All sums are exact BIGINTs; each mean is one IEEE
division, ROUND(,6)-frozen. The (plain, winsorized, trimmed) triple on
one row is the standard robustness diagnostic: if they disagree, the
tails own your average.

q205 — MEDIAN/MAD ROBUST OUTLIER GATE (Hampel 1974; the robust
z-score). Per language: exact nearest-rank median, then the median of
|x - med| (MAD) computed WITHOUT materializing per-row deviations —
the deviation distribution's value grain is derived arithmetically
from the length value grain (|v - med| carries count(v); two grains
merge by summation), and its median is another nearest-rank walk.
Outliers are |x - med| * 10000 > 44478 * MAD, i.e. the classical
3 * 1.4826 * MAD fence with the constant scaled to exact integers —
zero IEEE comparisons anywhere in the decision.

Scale shape (both): groupBy(lang, value) mergeable counts; every
window is PARTITIONED BY lang over the value grain (bounded by
distinct lengths per language); one |langs|-row rollup at the end.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, register

# ---------------------------------------------------------------------
# q204
_Q204_LO = 5  # lower fence percentile
_Q204_HI = 95  # upper fence percentile

_Q204_ORACLE = f"""
WITH vals AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, n_chars
),
cdf AS (
  SELECT lang, v, c,
         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM vals
),
fences AS (
  SELECT lang,
         CAST(MIN(CASE WHEN cum * 100 >= n * {_Q204_LO} THEN v END) AS BIGINT)
           AS p_lo,
         CAST(MIN(CASE WHEN cum * 100 >= n * {_Q204_HI} THEN v END) AS BIGINT)
           AS p_hi
  FROM cdf GROUP BY lang
)
SELECT v.lang,
       CAST(SUM(v.c) AS BIGINT) AS n_docs,
       f.p_lo, f.p_hi,
       ROUND(CAST(SUM(v.v * v.c) AS DOUBLE) / CAST(SUM(v.c) AS DOUBLE), 6)
         AS mean_plain,
       ROUND(CAST(SUM(CASE WHEN v.v < f.p_lo THEN f.p_lo * v.c
                           WHEN v.v > f.p_hi THEN f.p_hi * v.c
                           ELSE v.v * v.c END) AS DOUBLE)
             / CAST(SUM(v.c) AS DOUBLE), 6) AS mean_winsor,
       ROUND(CAST(SUM(CASE WHEN v.v >= f.p_lo AND v.v <= f.p_hi
                           THEN v.v * v.c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN v.v >= f.p_lo AND v.v <= f.p_hi
                             THEN v.c ELSE 0 END) AS DOUBLE), 6) AS mean_trim,
       CAST(SUM(CASE WHEN v.v < f.p_lo OR v.v > f.p_hi THEN v.c ELSE 0 END)
            AS BIGINT) AS n_clamped
FROM vals v JOIN fences f ON f.lang = v.lang
GROUP BY v.lang, f.p_lo, f.p_hi
"""


@register("q204_winsorized_stats", oracle=_Q204_ORACLE)
def q204_winsorized_stats(spark, sf_dir):
    vals = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy("lang").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("lang")
    cdf = vals.select(
        "lang",
        "v",
        "c",
        F.sum("c").over(wcum).cast("long").alias("cum"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    fences = cdf.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * _Q204_LO, F.col("v")))
        .cast("long")
        .alias("p_lo"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * _Q204_HI, F.col("v")))
        .cast("long")
        .alias("p_hi"),
    )
    j = vals.join(fences, "lang")
    w_term = (
        F.when(F.col("v") < F.col("p_lo"), F.col("p_lo") * F.col("c"))
        .when(F.col("v") > F.col("p_hi"), F.col("p_hi") * F.col("c"))
        .otherwise(F.col("v") * F.col("c"))
    )
    inside = (F.col("v") >= F.col("p_lo")) & (F.col("v") <= F.col("p_hi"))
    return j.groupBy("lang", "p_lo", "p_hi").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.round(
            F.sum(F.col("v") * F.col("c")).cast("double") / F.sum("c").cast("double"),
            6,
        ).alias("mean_plain"),
        F.round(
            F.sum(w_term).cast("double") / F.sum("c").cast("double"), 6
        ).alias("mean_winsor"),
        F.round(
            F.sum(F.when(inside, F.col("v") * F.col("c")).otherwise(0)).cast("double")
            / F.sum(F.when(inside, F.col("c")).otherwise(0)).cast("double"),
            6,
        ).alias("mean_trim"),
        F.sum(F.when(~inside, F.col("c")).otherwise(0)).cast("long").alias("n_clamped"),
    ).select(
        "lang", "n_docs", "p_lo", "p_hi", "mean_plain", "mean_winsor",
        "mean_trim", "n_clamped",
    )


# ---------------------------------------------------------------------
# q205
# 3 * 1.4826 = 4.4478 -> fence: |x - med| * 10000 > 44478 * mad
_Q205_FENCE_NUM = 44478
_Q205_FENCE_DEN = 10000

_Q205_ORACLE = f"""
WITH vals AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, n_chars
),
cdf AS (
  SELECT lang, v, c,
         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM vals
),
med AS (
  SELECT lang,
         CAST(MIN(CASE WHEN cum * 2 >= n THEN v END) AS BIGINT) AS med
  FROM cdf GROUP BY lang
),
devs AS (
  SELECT v.lang, ABS(v.v - m.med) AS dv, CAST(SUM(v.c) AS BIGINT) AS c
  FROM vals v JOIN med m ON m.lang = v.lang
  GROUP BY v.lang, ABS(v.v - m.med)
),
dev_cdf AS (
  SELECT lang, dv, c,
         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY dv) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM devs
),
mad AS (
  SELECT lang,
         CAST(MIN(CASE WHEN cum * 2 >= n THEN dv END) AS BIGINT) AS mad
  FROM dev_cdf GROUP BY lang
)
SELECT v.lang, m.med, d.mad,
       CAST(SUM(v.c) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ABS(v.v - m.med) * {_Q205_FENCE_DEN}
                          > {_Q205_FENCE_NUM} * d.mad
                     THEN v.c ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST((1000000 * SUM(CASE WHEN ABS(v.v - m.med) * {_Q205_FENCE_DEN}
                                     > {_Q205_FENCE_NUM} * d.mad
                                THEN v.c ELSE 0 END)) // SUM(v.c) AS BIGINT)
         AS outlier_frac_u
FROM vals v
JOIN med m ON m.lang = v.lang
JOIN mad d ON d.lang = v.lang
GROUP BY v.lang, m.med, d.mad
"""


@register("q205_mad_outliers", oracle=_Q205_ORACLE)
def q205_mad_outliers(spark, sf_dir):
    vals = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    wall = Window.partitionBy("lang")

    def nearest_rank_median(df, val_col, out_name):
        wcum = (
            Window.partitionBy("lang")
            .orderBy(val_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cdf = df.select(
            "lang",
            F.col(val_col).alias("x"),
            "c",
            F.sum("c").over(wcum).cast("long").alias("cum"),
            F.sum("c").over(wall).cast("long").alias("n"),
        )
        return cdf.groupBy("lang").agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("x")))
            .cast("long")
            .alias(out_name)
        )

    med = nearest_rank_median(vals, "v", "med")
    devs = (
        vals.join(med, "lang")
        .groupBy("lang", F.abs(F.col("v") - F.col("med")).alias("dv"))
        .agg(F.sum("c").cast("long").alias("c"))
    )
    mad = nearest_rank_median(devs, "dv", "mad")
    j = vals.join(med, "lang").join(mad, "lang")
    is_out = (
        F.abs(F.col("v") - F.col("med")) * _Q205_FENCE_DEN
        > _Q205_FENCE_NUM * F.col("mad")
    )
    return j.groupBy("lang", "med", "mad").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.when(is_out, F.col("c")).otherwise(0)).cast("long").alias("n_outliers"),
        F.expr(
            f"(1000000 * sum(case when abs(v - med) * {_Q205_FENCE_DEN}"
            f" > {_Q205_FENCE_NUM} * mad then c else 0 end)) div sum(c)"
        )
        .cast("long")
        .alias("outlier_frac_u"),
    ).select("lang", "med", "mad", "n_docs", "n_outliers", "outlier_frac_u")
