"""Round-5 continuation wave 29: sequential change detection.

q206 — CUSUM DRIFT DETECTOR (Page 1954). The sequential-analysis
member of the drift family: q193/q197/q203 test snapshot A vs
snapshot B; CUSUM watches a STREAM of ingestion batches and flags the
batch at which the mean shifted. Batches are the 10 deterministic md5
ingestion buckets (q188's convention) in bucket order; the monitored
statistic is the batch mean of n_chars in integer micro-units
(floor-div — engine-identical); the reference value mu0 is the global
mean, the slack k is 1% of it. The one-sided CUSUM recurrence
S_t = max(0, S_{t-1} + (x_t - mu0 - k)) is not a plain prefix sum,
but it has the classical closed form S_t = P_t - min_{j<=t} P_j over
the prefix sums P of the deviations — TWO stacked windows, no
recursion, exact BIGINT micro-units end to end. Both one-sided
statistics (upward and downward shift) are reported with the alarm
flag at decision interval h = 5% of mu0.
The pytest proves the closed form equals the classical recurrence
exactly (both on the corpus and on a synthetic shifted stream); at
tiny scale factors the 5% interval can fire on small-sample noise
(~50 docs/bucket at sf0.001), which is the correct behavior of the
statistic, not a defect — the oracle verifies the same decision.

Scale shape: one mergeable groupBy(bucket) over the corpus; every
window runs over the 10-row bucket grain. At a real 10^6-batch
history the prefix windows key on coarse time ranges — same shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, md5_bucket, md5_bucket_sql, register

_Q206_BUCKETS = 10
_Q206_K_PCT = 1  # slack: 1% of mu0
_Q206_H_PCT = 5  # decision interval: 5% of mu0

_Q206_ORACLE = f"""
WITH d AS (
  SELECT CAST({md5_bucket_sql("doc_id", _Q206_BUCKETS)} AS BIGINT) AS b,
         CAST(n_chars AS BIGINT) AS x
  FROM documents
),
batches AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
         CAST((1000000 * SUM(x)) // COUNT(*) AS BIGINT) AS mean_u
  FROM d GROUP BY b
),
g AS (
  SELECT CAST((1000000 * SUM(x)) // COUNT(*) AS BIGINT) AS mu0_u FROM d
),
dev AS (
  SELECT b.b, b.n, b.mean_u, g.mu0_u,
         b.mean_u - g.mu0_u - g.mu0_u * {_Q206_K_PCT} // 100 AS d_up,
         g.mu0_u - b.mean_u - g.mu0_u * {_Q206_K_PCT} // 100 AS d_dn,
         g.mu0_u * {_Q206_H_PCT} // 100 AS h_u
  FROM batches b CROSS JOIN g
),
pre AS (
  SELECT b, n, mean_u, mu0_u, h_u,
         CAST(SUM(d_up) OVER (ORDER BY b) AS BIGINT) AS p_up,
         CAST(SUM(d_dn) OVER (ORDER BY b) AS BIGINT) AS p_dn
  FROM dev
)
SELECT b AS bucket, n, mean_u, mu0_u,
       CAST(p_up - LEAST(MIN(p_up) OVER (ORDER BY b), 0) AS BIGINT) AS s_up,
       CAST(p_dn - LEAST(MIN(p_dn) OVER (ORDER BY b), 0) AS BIGINT) AS s_dn,
       h_u,
       (p_up - LEAST(MIN(p_up) OVER (ORDER BY b), 0) > h_u
        OR p_dn - LEAST(MIN(p_dn) OVER (ORDER BY b), 0) > h_u) AS alarm
FROM pre
"""


@register("q206_cusum_drift", oracle=_Q206_ORACLE)
def q206_cusum_drift(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        md5_bucket(F.col("doc_id"), _Q206_BUCKETS).alias("b"),
        F.col("n_chars").cast("long").alias("x"),
    )
    batches = d.groupBy("b").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("(1000000 * sum(x)) div count(*)").cast("long").alias("mean_u"),
    )
    g = d.agg(
        F.expr("(1000000 * sum(x)) div count(*)").cast("long").alias("mu0_u")
    )
    dev = batches.crossJoin(F.broadcast(g)).select(
        "b",
        "n",
        "mean_u",
        "mu0_u",
        F.expr(f"mean_u - mu0_u - mu0_u * {_Q206_K_PCT} div 100").alias("d_up"),
        F.expr(f"mu0_u - mean_u - mu0_u * {_Q206_K_PCT} div 100").alias("d_dn"),
        F.expr(f"mu0_u * {_Q206_H_PCT} div 100").cast("long").alias("h_u"),
    )
    wp = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pre = dev.select(
        "b",
        "n",
        "mean_u",
        "mu0_u",
        "h_u",
        F.sum("d_up").over(wp).cast("long").alias("p_up"),
        F.sum("d_dn").over(wp).cast("long").alias("p_dn"),
    )
    s_up = F.col("p_up") - F.least(F.min("p_up").over(wp), F.lit(0))
    s_dn = F.col("p_dn") - F.least(F.min("p_dn").over(wp), F.lit(0))
    return pre.select(
        F.col("b").alias("bucket"),
        "n",
        "mean_u",
        "mu0_u",
        s_up.cast("long").alias("s_up"),
        s_dn.cast("long").alias("s_dn"),
        "h_u",
        ((s_up > F.col("h_u")) | (s_dn > F.col("h_u"))).alias("alarm"),
    )
