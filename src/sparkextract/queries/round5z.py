"""Round-5 continuation wave 24: KMV/theta set sketches and the
Kolmogorov-Smirnov two-sample test.

q196 — KMV (K-MINIMUM-VALUES) / THETA SKETCH with INTERSECTION
(Bar-Yossef et al. 2002; Dasgupta et al. 2016 — the DataSketches theta
family). The sketch HLL (q83/q171) cannot give you: set INTERSECTION
estimates with a bounded-size mergeable summary. Universe = distinct
document tokens; population split = the md5 half-split (q193's
convention). Per half, the sketch is the k=256 smallest 48-bit md5
hash values of the distinct tokens; est_distinct = (k-1) * 2^48 /
kth_min (unbiased for uniform hashes). Intersection: theta = the
SMALLER of the two kth-mins; est = |{h in S_A ∩ S_B : h < theta}| *
2^48 / theta — the standard theta-sketch set operation. Exact distinct
counts ride along so the output is its own error audit.
Every estimate divides exact BIGINTs (hashes < 2^48 < 2^53, exact in
doubles), ROUND(,6)-frozen.
Reference intent: corpus vocabulary statistics at sketch size,
generalizing the q83/q171 family to set algebra.

Scale shape: the min-k is computed the way a 1000-executor top-k
actually runs — TWO-LEVEL: per-(half, hash-bucket) rank window keeps
the k smallest within each of 64 bounded buckets (parallel, each
vocab/64 rows), then a second rank over the 64*k survivors per half.
No vocab-sized single-partition sort anywhere. The intersection join
is k-row vs k-row (broadcast-trivial).

q197 — TWO-SAMPLE KOLMOGOROV-SMIRNOV TEST (Smirnov 1939): the
CONTINUOUS-distribution drift gate next to q193's categorical
chi-square. Are the n_chars distributions of the two md5 halves the
same? D = max_v |F_A(v) - F_B(v)| over the empirical CDFs. Computed on
the VALUE grain (distinct n_chars values, far smaller than the
corpus): per-value counts per half -> prefix sums -> the gap in exact
integer micro-units |cum_a * n_b - cum_b * n_a| * 1e6 // (n_a * n_b)
(no floats at all). Output: the 20 largest-gap values (tie: value asc)
with their CDF positions, the global D, and the scaled statistic
sqrt(n_a*n_b/(n_a+n_b)) * D (ROUND(,6) double) whose >1.36 rejection
threshold is the alpha=0.05 KS line.

Scale shape: one mergeable groupBy(value); the prefix-sum window runs
over the value grain (bounded by the number of distinct lengths, not
corpus size; range-bucket the window key if values are unbounded).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import (
    checkpoint_memo,
    load,
    md5_bucket_sql,
    register,
)

# ---------------------------------------------------------------------
# q196
_Q196_K = 256
_Q196_BUCKETS = 64  # first-level top-k buckets
_Q196_MAXH = 1 << 48

# 48-bit hash of a token (12 md5 hex digits — exact integer in BIGINT
# and in an IEEE double)
_Q196_HV = "CAST(('0x' || SUBSTRING(md5(t), 1, 12)) AS UBIGINT)"

_Q196_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT CAST({md5_bucket_sql("doc_id", 2)} AS BIGINT) AS half,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
  FROM documents
),
hv AS (
  SELECT DISTINCT half, CAST({_Q196_HV} AS BIGINT) AS h FROM toks
),
lvl1 AS (
  SELECT half, h FROM (
    SELECT half, h,
           ROW_NUMBER() OVER (PARTITION BY half, h % {_Q196_BUCKETS}
                              ORDER BY h ASC) AS rn
    FROM hv
  ) WHERE rn <= {_Q196_K}
),
sketch AS (
  SELECT half, h, rn2 FROM (
    SELECT half, h,
           ROW_NUMBER() OVER (PARTITION BY half ORDER BY h ASC) AS rn2
    FROM lvl1
  ) WHERE rn2 <= {_Q196_K}
),
kth AS (
  SELECT half, CAST(MAX(h) AS BIGINT) AS kth_min,
         CAST(COUNT(*) AS BIGINT) AS k_eff
  FROM sketch GROUP BY half
),
exact AS (
  SELECT half, CAST(COUNT(*) AS BIGINT) AS n_exact FROM hv GROUP BY half
),
halves AS (
  SELECT 'half' || CAST(e.half AS VARCHAR) AS part,
         e.n_exact, k.k_eff, k.kth_min,
         ROUND(CAST((k.k_eff - 1) AS DOUBLE) * {_Q196_MAXH}.0
               / CAST(k.kth_min AS DOUBLE), 6) AS est
  FROM exact e JOIN kth k ON k.half = e.half
),
theta AS (SELECT CAST(MIN(kth_min) AS BIGINT) AS th FROM kth),
inter AS (
  SELECT 'intersection' AS part,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM hv a
          WHERE a.half = 0 AND EXISTS (
            SELECT 1 FROM hv b WHERE b.half = 1 AND b.h = a.h))
           AS n_exact,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM sketch a JOIN sketch b ON a.h = b.h
          CROSS JOIN theta
          WHERE a.half = 0 AND b.half = 1 AND a.h < theta.th) AS k_eff,
         theta.th AS kth_min,
         ROUND((SELECT CAST(COUNT(*) AS DOUBLE)
                FROM sketch a JOIN sketch b ON a.h = b.h
                CROSS JOIN theta t2
                WHERE a.half = 0 AND b.half = 1 AND a.h < t2.th)
               * {_Q196_MAXH}.0 / CAST(theta.th AS DOUBLE), 6) AS est
  FROM theta
)
SELECT part, n_exact, k_eff, kth_min, est FROM halves
UNION ALL
SELECT part, n_exact, k_eff, kth_min, est FROM inter
"""


def _q196_hv(spark, sf_dir):
    from sparkextract.queries.base import md5_bucket

    toks = (
        load(spark, sf_dir, "documents")
        .select(
            md5_bucket(F.col("doc_id"), 2).alias("half"),
            F.explode(F.split("text", " ")).alias("t"),
        )
        .filter(F.col("t") != "")
        .distinct()
    )
    return toks.select(
        "half",
        F.conv(F.substring(F.md5("t"), 1, 12), 16, 10).cast("long").alias("h"),
    ).distinct()


@register("q196_kmv_theta_sketch", oracle=_Q196_ORACLE)
def q196_kmv_theta_sketch(spark, sf_dir):
    # the distinct hash universe feeds the sketch build, the exact
    # counts, and the exact-intersection audit (4 sibling subtrees);
    # eager materialization keeps it ONE corpus scan (PLANS.md showed
    # 6 scans / 18 shuffles without it). The frame is vocab-sized.
    hv = checkpoint_memo(
        spark, sf_dir, "q196_hv", lambda: _q196_hv(spark, sf_dir)
    )
    w1 = Window.partitionBy("half", F.col("h") % _Q196_BUCKETS).orderBy(F.asc("h"))
    lvl1 = (
        hv.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _Q196_K)
        .drop("rn")
    )
    w2 = Window.partitionBy("half").orderBy(F.asc("h"))
    sketch = checkpoint_memo(
        spark,
        sf_dir,
        "q196_sketch",
        lambda: lvl1.withColumn("rn2", F.row_number().over(w2)).filter(
            F.col("rn2") <= _Q196_K
        ),
    )
    kth = sketch.groupBy("half").agg(
        F.max("h").cast("long").alias("kth_min"),
        F.count("*").cast("long").alias("k_eff"),
    )
    exact = hv.groupBy("half").agg(F.count("*").cast("long").alias("n_exact"))
    halves = (
        exact.join(kth, "half")
        .select(
            F.concat(F.lit("half"), F.col("half").cast("string")).alias("part"),
            "n_exact",
            "k_eff",
            "kth_min",
            F.round(
                (F.col("k_eff") - 1).cast("double")
                * F.lit(float(_Q196_MAXH))
                / F.col("kth_min").cast("double"),
                6,
            ).alias("est"),
        )
    )
    theta = kth.agg(F.min("kth_min").cast("long").alias("th"))
    s0 = sketch.filter(F.col("half") == 0).select("h")
    s1 = sketch.filter(F.col("half") == 1).select("h")
    inter_k = (
        s0.join(s1, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count("*").cast("long").alias("k_eff"))
    )
    h0 = hv.filter(F.col("half") == 0).select("h")
    h1 = hv.filter(F.col("half") == 1).select("h")
    inter_exact = h0.join(h1, "h", "left_semi").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    inter = (
        inter_exact.crossJoin(inter_k)
        .crossJoin(F.broadcast(theta))
        .select(
            F.lit("intersection").alias("part"),
            "n_exact",
            "k_eff",
            F.col("th").cast("long").alias("kth_min"),
            F.round(
                F.col("k_eff").cast("double")
                * F.lit(float(_Q196_MAXH))
                / F.col("th").cast("double"),
                6,
            ).alias("est"),
        )
    )
    return halves.unionByName(inter)


# ---------------------------------------------------------------------
# q197
_Q197_TOPN = 20

_Q197_ORACLE = f"""
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
g AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a, CAST(SUM(c_b) AS BIGINT) AS n_b
      FROM vals),
cdf AS (
  SELECT v,
         CAST(SUM(c_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(SUM(c_b) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM vals
),
gaps AS (
  SELECT c.v, c.cum_a, c.cum_b,
         CAST(ABS(c.cum_a * g.n_b - c.cum_b * g.n_a) * 1000000
              // (g.n_a * g.n_b) AS BIGINT) AS gap_u,
         g.n_a, g.n_b
  FROM cdf c CROSS JOIN g
),
ks AS (SELECT CAST(MAX(gap_u) AS BIGINT) AS ks_u FROM gaps)
SELECT v, cum_a, cum_b, gap_u, n_a, n_b, ks.ks_u,
       ROUND(SQRT(CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * CAST(ks.ks_u AS DOUBLE) / 1000000.0, 6) AS ks_scaled
FROM gaps CROSS JOIN ks
ORDER BY gap_u DESC, v ASC
LIMIT {_Q197_TOPN}
"""


@register("q197_ks_two_sample", oracle=_Q197_ORACLE)
def q197_ks_two_sample(spark, sf_dir):
    from sparkextract.queries.base import md5_bucket

    d = load(spark, sf_dir, "documents").select(
        md5_bucket(F.col("doc_id"), 2).alias("half"), "n_chars"
    )
    vals = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c_b"),
    )
    g = vals.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = vals.select(
        "v",
        F.sum("c_a").over(wc).cast("long").alias("cum_a"),
        F.sum("c_b").over(wc).cast("long").alias("cum_b"),
    )
    gaps = cdf.crossJoin(F.broadcast(g)).select(
        "v",
        "cum_a",
        "cum_b",
        F.expr("abs(cum_a * n_b - cum_b * n_a) * 1000000 div (n_a * n_b)")
        .cast("long")
        .alias("gap_u"),
        "n_a",
        "n_b",
    )
    ks = gaps.agg(F.max("gap_u").cast("long").alias("ks_u"))
    scaled = F.round(
        F.sqrt((F.col("n_a") * F.col("n_b")).cast("double") / (F.col("n_a") + F.col("n_b")).cast("double"))
        * F.col("ks_u").cast("double")
        / 1000000.0,
        6,
    )
    return (
        gaps.crossJoin(F.broadcast(ks))
        .select("v", "cum_a", "cum_b", "gap_u", "n_a", "n_b", "ks_u", scaled.alias("ks_scaled"))
        .orderBy(F.desc("gap_u"), F.asc("v"))
        .limit(_Q197_TOPN)
    )
