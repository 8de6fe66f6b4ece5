"""Round-5 continuation wave 27: crawl-budget allocation and the
rank-based two-sample test.

q202 — UCB1 CRAWL SCHEDULER (Auer et al. 2002). Crawl-budget
allocation as a multi-armed bandit: each SOURCE is an arm, its reward
is the keep rate of documents it has yielded (the q40 extraction-keep
convention n_chars >= 100), and the next crawl slice goes to the arm
maximizing UCB = mean_reward + sqrt(2 ln N / n). Unlike Thompson
sampling, UCB1 is fully DETERMINISTIC given the counts — no sampled
randomness to reconcile across engines. The mean is exact integer
micro-units; the bonus and UCB are ROUND(,6)-frozen doubles; the
priority ranking runs on the frozen surface with the source string as
tie-break.
Reference intent: the reference processes a fixed directory
(/root/reference/src/pdf_extraction/main.py batch loop); a crawl at
10^12 scale must decide WHERE to spend ingest budget — this is that
decision as a table.

Scale shape: one mergeable groupBy(source) + a 1-row broadcast global;
ranking over |sources| rows.

q203 — MANN-WHITNEY U TEST, tie-corrected (Mann & Whitney 1947) — the
RANK-based two-sample location test completing the drift-test family
(q193 chi-square: categorical; q197 KS: max-CDF-gap; this: rank
shift). Computed exactly on the VALUE grain with midranks, all in
integers by carrying 2x quantities: 2*rank_sum_a = sum_v c_a(v) *
(2*cum_before(v) + c_t(v) + 1); 2U = 2*rank_sum - n_a(n_a+1); the
normal-approximation z uses the tie-corrected variance sigma^2 =
n_a*n_b/12 * ((n+1) - sum(t^3 - t)/(n(n-1))) — every sum is an exact
BIGINT before the single sqrt/divide, ROUND(,6)-frozen.

Scale shape: one mergeable groupBy(value) + a prefix-sum window over
the value grain (bounded by distinct lengths) + a 1-row reduction.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, md5_bucket_sql, register

# ---------------------------------------------------------------------
# q202
_Q202_KEEP_MIN = 100  # q40 extraction-keep convention

_Q202_ORACLE = f"""
WITH arms AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n_chars >= {_Q202_KEEP_MIN} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept
  FROM documents GROUP BY source
),
g AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM arms),
scored AS (
  SELECT a.source, a.n_docs, a.n_kept,
         CAST((1000000 * a.n_kept) // a.n_docs AS BIGINT) AS mean_u,
         ROUND(SQRT(2.0 * ln(CAST(g.n_total AS DOUBLE))
                    / CAST(a.n_docs AS DOUBLE)), 6) AS bonus,
         ROUND(CAST(a.n_kept AS DOUBLE) / CAST(a.n_docs AS DOUBLE)
               + SQRT(2.0 * ln(CAST(g.n_total AS DOUBLE))
                      / CAST(a.n_docs AS DOUBLE)), 6) AS ucb
  FROM arms a CROSS JOIN g
)
SELECT source, n_docs, n_kept, mean_u, bonus, ucb,
       CAST(ROW_NUMBER() OVER (ORDER BY ucb DESC, source ASC) AS BIGINT)
         AS priority
FROM scored
"""


@register("q202_ucb_crawl_scheduler", oracle=_Q202_ORACLE)
def q202_ucb_crawl_scheduler(spark, sf_dir):
    arms = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_chars") >= _Q202_KEEP_MIN, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
    )
    g = arms.agg(F.sum("n_docs").cast("long").alias("n_total"))
    j = arms.crossJoin(F.broadcast(g))
    bonus = F.sqrt(
        2.0 * F.log(F.col("n_total").cast("double")) / F.col("n_docs").cast("double")
    )
    ucb = F.col("n_kept").cast("double") / F.col("n_docs").cast("double") + bonus
    scored = j.select(
        "source",
        "n_docs",
        "n_kept",
        F.expr("(1000000 * n_kept) div n_docs").cast("long").alias("mean_u"),
        F.round(bonus, 6).alias("bonus"),
        F.round(ucb, 6).alias("ucb"),
    )
    w = Window.orderBy(F.desc("ucb"), F.asc("source"))
    return scored.withColumn("priority", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------
# q203
_Q203_ORACLE = f"""
WITH d AS (
  SELECT CAST({md5_bucket_sql("doc_id", 2)} AS BIGINT) AS half, n_chars
  FROM documents
),
vals AS (
  SELECT n_chars AS v,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM d GROUP BY n_chars
),
ranked AS (
  SELECT v, c_a, c_b, c_a + c_b AS c_t,
         CAST(COALESCE(SUM(c_a + c_b) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM vals
),
s AS (
  SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
         CAST(SUM(c_b) AS BIGINT) AS n_b,
         CAST(SUM(c_a * (2 * cum_before + c_t + 1)) AS BIGINT) AS rs2_a,
         CAST(SUM(c_t * c_t * c_t - c_t) AS BIGINT) AS tie_sum
  FROM ranked
)
SELECT n_a, n_b, rs2_a,
       CAST(rs2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       CAST(2 * n_a * n_b - (rs2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b,
       tie_sum,
       ROUND((CAST(rs2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0
              - CAST(n_a * n_b AS DOUBLE) / 2.0)
             / SQRT(CAST(n_a * n_b AS DOUBLE) / 12.0
                    * (CAST(n_a + n_b + 1 AS DOUBLE)
                       - CAST(tie_sum AS DOUBLE)
                         / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE))),
             6) AS z
FROM s
"""


@register("q203_mann_whitney_u", oracle=_Q203_ORACLE)
def q203_mann_whitney_u(spark, sf_dir):
    from sparkextract.queries.base import md5_bucket

    d = load(spark, sf_dir, "documents").select(
        md5_bucket(F.col("doc_id"), 2).alias("half"), "n_chars"
    )
    vals = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c_b"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "v",
        "c_a",
        "c_b",
        (F.col("c_a") + F.col("c_b")).alias("c_t"),
        F.coalesce(F.sum(F.col("c_a") + F.col("c_b")).over(wc), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    s = ranked.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.sum(F.col("c_a") * (2 * F.col("cum_before") + F.col("c_t") + 1))
        .cast("long")
        .alias("rs2_a"),
        F.sum(F.col("c_t") * F.col("c_t") * F.col("c_t") - F.col("c_t"))
        .cast("long")
        .alias("tie_sum"),
    )
    u2_a = F.col("rs2_a") - F.col("n_a") * (F.col("n_a") + 1)
    n = F.col("n_a") + F.col("n_b")
    z = F.round(
        (u2_a.cast("double") / 2.0 - (F.col("n_a") * F.col("n_b")).cast("double") / 2.0)
        / F.sqrt(
            (F.col("n_a") * F.col("n_b")).cast("double")
            / 12.0
            * (
                (n + 1).cast("double")
                - F.col("tie_sum").cast("double") / (n * (n - 1)).cast("double")
            )
        ),
        6,
    )
    return s.select(
        "n_a",
        "n_b",
        "rs2_a",
        u2_a.cast("long").alias("u2_a"),
        (2 * F.col("n_a") * F.col("n_b") - u2_a).cast("long").alias("u2_b"),
        "tie_sum",
        z.alias("z"),
    )
