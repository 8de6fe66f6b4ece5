"""Round-5 continuation wave 14: join planning, record linkage,
alignment hubness, and batch-packing efficiency.

q175 — AGMS TWO-TABLE JOIN-SIZE ESTIMATE (Alon, Gibbons, Matias &
Szegedy 1999). The companion of q174's self-join F2: the output size
of orders ⋈ lineitem on orderkey is sum_k c_O(k) * c_L(k), and the
AGMS cross-sketch estimates it as median_j(Z_O,j * Z_L,j) with the
SAME md5-derived ±1 sign stream applied to both sides — each Z is one
map-side-combinable SUM over its own table, so the estimate costs two
independent single passes and a 9-number multiply, while the exact
number (the evidence column) costs the real key groupBy+join. This is
the sketch a distributed planner consults before choosing
broadcast-vs-shuffle. All arithmetic exact BIGINT.

q176 — FELLEGI-SUNTER RECORD LINKAGE (Fellegi & Sunter 1969). The
probabilistic record-linkage canon, deterministic end to end: link
customer against a synthetically dirtied copy (names truncated or
case-mangled, acctbal jittered by ±1 for a deterministic md5 subset),
block on (nation, mktsegment, first name letter) — the dirt preserves
the blocking key, so candidate recall is 100% by construction and the
audit measures CLASSIFICATION, not blocking loss. Per-field agreement
weights w_f = ln(m_f/u_f) with m (P(agree|match)) and u
(P(agree|non-match)) estimated from the blocked candidate pairs
themselves (ground truth = same custkey); weights ROUND(...,6)-frozen
as DECIMAL(18,6) so per-pair scores are exact order-free decimal sums
(the q125 discipline). Verdict per decision threshold: TP/FP/FN/TN
counts. Scale shape: candidates come from a 3-part blocking equi-join
(never all-pairs), m/u are two mergeable conditional aggregates, and
scoring is map-side over the candidate table.

q177 — MARGIN-CRITERION ALIGNMENT (Artetxe & Schwenk 2019,
CCMatrix/LASER bitext mining). Raw nearest-cosine retrieval suffers
hubness: a few vectors are everyone's neighbor. The margin criterion
rescales each pair by both endpoints' average k-NN similarity —
margin(x,y) = 2*cos(x,y) - avgk(x) - avgk(y) in the difference form —
and retrieves by margin instead. Executable audit on a bounded
md5-bucket sample: every cosine is snapped ONCE to BIGINT micro-units
(the q128 discipline), avgk is an exact integer floor-mean of the
top-k snapped cosines, so the entire margin recursion is pure int64
and bit-identical across engines; verdict = per-query raw-top-1 vs
margin-top-1 with a changed flag and the hub's in-degree drop. At
real scale the candidate generator is the ANN index (q46/q111); the
margin re-scoring touches only candidate pairs.

q178 — PADDING-WASTE BATCHING AUDIT. Fixed-size training batches pad
every sequence to the batch max: the packing-policy decision (arrival
order vs global length-sort vs quantile length-bucketing) is a direct
throughput lever. The audit forms batches of B=8 under each policy
with deterministic total orders (ties broken by doc_id), computes
padded = sum_batch(B_present * max_len - sum_len) in exact integers,
and reports per-policy waste. Scale shape: each policy is ONE window
over a deterministic order (q105's two-level rank applies verbatim
for the global sort at 100 TB) plus a batch-grain rollup; nothing
content-keyed, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import (
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

# --------------------------------------------------------------------------
_Q175_NEST = 9


def _q175_oracle() -> str:
    zo, zl = [], []
    for j in range(_Q175_NEST):
        bucket = md5_bucket_sql("'j" + str(j) + "|' || CAST(k AS VARCHAR)", 2)
        sign = f"CASE WHEN {bucket} = 0 THEN 1 ELSE -1 END"
        zo.append(f"CAST(SUM({sign}) AS BIGINT) AS z{j}")
        zl.append(f"CAST(SUM({sign}) AS BIGINT) AS z{j}")
    prods = ", ".join(f"o.z{j} * l.z{j}" for j in range(_Q175_NEST))
    return f"""
WITH so AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders, {", ".join(zo)}
  FROM (SELECT o_orderkey AS k FROM orders)
),
sl AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitem, {", ".join(zl)}
  FROM (SELECT l_orderkey AS k FROM lineitem)
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_size
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
est AS (
  SELECT n_orders, n_lineitem,
         list_sort([{prods}])[{_Q175_NEST // 2 + 1}] AS est_join_size
  FROM so o, sl l
)
SELECT e.n_orders, e.n_lineitem, x.exact_join_size, e.est_join_size,
       (1000000 * e.est_join_size) // x.exact_join_size AS ratio_u
FROM est e, exact x
"""


@register("q175_agms_join_size", oracle=_q175_oracle())
def q175_agms_join_size(spark, sf_dir):
    def sketch(df, key, cnt_name):
        signs = [
            F.sum(
                F.when(
                    md5_bucket(
                        F.concat(F.lit(f"j{j}|"), F.col(key).cast("string")), 2
                    )
                    == 0,
                    1,
                ).otherwise(-1)
            )
            .cast("long")
            .alias(f"z{j}")
            for j in range(_Q175_NEST)
        ]
        return df.agg(F.count("*").cast("long").alias(cnt_name), *signs)

    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey")
    so = sketch(orders, "o_orderkey", "n_orders")
    sl = sketch(lineitem, "l_orderkey", "n_lineitem").select(
        "n_lineitem", *[F.col(f"z{j}").alias(f"y{j}") for j in range(_Q175_NEST)]
    )
    exact = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).agg(F.count("*").cast("long").alias("exact_join_size"))
    )
    est = so.crossJoin(F.broadcast(sl)).select(
        "n_orders",
        "n_lineitem",
        F.array_sort(
            F.array(
                *[F.col(f"z{j}") * F.col(f"y{j}") for j in range(_Q175_NEST)]
            )
        )
        .getItem(_Q175_NEST // 2)
        .alias("est_join_size"),
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_orders",
        "n_lineitem",
        "exact_join_size",
        "est_join_size",
        F.expr("(1000000 * est_join_size) div exact_join_size").alias("ratio_u"),
    )


# --------------------------------------------------------------------------
_Q176_DIRTY_BUCKETS = 3  # bucket 0: truncate name; bucket 1: jitter acctbal
_Q176_THRESHOLDS = [0, 4, 8]  # decision thresholds on the summed weight

# dirty copy of customer: same custkey + 100000; md5 bucket 0 loses the
# name tail, bucket 1 shifts acctbal by +1.00 — blocking fields
# (nation, segment, first letter) always survive
_Q176_DIRTY = f"""
  SELECT c_custkey + 100000 AS d_key, c_custkey AS true_key,
         CASE WHEN {md5_bucket_sql("c_custkey", _Q176_DIRTY_BUCKETS)} = 0
              THEN SUBSTRING(c_name, 1, GREATEST(LENGTH(c_name) - 3, 1))
              ELSE c_name END AS d_name,
         CASE WHEN {md5_bucket_sql("c_custkey", _Q176_DIRTY_BUCKETS)} = 1
              THEN c_acctbal + 1.00 ELSE c_acctbal END AS d_acctbal,
         c_nationkey AS d_nationkey, c_mktsegment AS d_mktsegment
  FROM customer
"""

_Q176_AGREE = """
  SELECT c.c_custkey, d.d_key, (d.true_key = c.c_custkey) AS is_match,
         CASE WHEN d.d_name = c.c_name THEN 1 ELSE 0 END AS a_name,
         CASE WHEN SUBSTRING(d.d_name, 1, 8) = SUBSTRING(c.c_name, 1, 8)
              THEN 1 ELSE 0 END AS a_prefix,
         CASE WHEN ABS(d.d_acctbal - c.c_acctbal) <= 1.005 THEN 1 ELSE 0 END
           AS a_bal
  FROM customer c
  JOIN dirty d
    ON d.d_nationkey = c.c_nationkey
   AND d.d_mktsegment = c.c_mktsegment
   AND SUBSTRING(d.d_name, 1, 1) = SUBSTRING(c.c_name, 1, 1)
"""

_Q176_FIELDS = ["name", "prefix", "bal"]


def _q176_oracle() -> str:
    mu = ", ".join(
        f"SUM(CASE WHEN is_match THEN a_{f} ELSE 0 END) AS m_{f}, "
        f"SUM(CASE WHEN is_match THEN 0 ELSE a_{f} END) AS u_{f}"
        for f in _Q176_FIELDS
    )
    # per-field agree/disagree weights: ln(m/u) and ln((1-m)/(1-u)),
    # Laplace-smoothed, ROUND(...,6) frozen as DECIMAL(18,6)
    wdefs = ", ".join(
        f"CAST(ROUND(ln(((m_{f} + 1.0) / (n_match + 2.0))"
        f" / ((u_{f} + 1.0) / (n_non + 2.0))), 6) AS DECIMAL(18,6)) AS wa_{f}, "
        f"CAST(ROUND(ln((1.0 - (m_{f} + 1.0) / (n_match + 2.0))"
        f" / (1.0 - (u_{f} + 1.0) / (n_non + 2.0))), 6) AS DECIMAL(18,6))"
        f" AS wd_{f}"
        for f in _Q176_FIELDS
    )
    score = " + ".join(
        f"CASE WHEN a_{f} = 1 THEN w.wa_{f} ELSE w.wd_{f} END"
        for f in _Q176_FIELDS
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS threshold" for t in _Q176_THRESHOLDS
    )
    return f"""
WITH dirty AS (
  {_Q176_DIRTY}
),
agree AS (
  {_Q176_AGREE}
),
mu AS (
  SELECT CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT) AS n_non,
         {mu}
  FROM agree
),
w AS (SELECT n_match, n_non, {wdefs} FROM mu),
scored AS (
  SELECT a.is_match, CAST({score} AS DOUBLE) AS score
  FROM agree a, w
),
thresholds AS ({rows})
SELECT t.threshold, w.n_match, w.n_non,
  CAST(SUM(CASE WHEN s.score >= t.threshold AND s.is_match
           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(SUM(CASE WHEN s.score >= t.threshold AND NOT s.is_match
           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
  CAST(SUM(CASE WHEN s.score < t.threshold AND s.is_match
           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
  CAST(SUM(CASE WHEN s.score < t.threshold AND NOT s.is_match
           THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM thresholds t, scored s, w
GROUP BY t.threshold, w.n_match, w.n_non
"""


def fs_scored_pairs(spark, sf_dir):
    """Blocked candidate pairs with the Fellegi-Sunter log-odds score:
    (c_custkey, d_key, is_match, score, n_match, n_non). Shared by q176
    (threshold confusion sweep) and q184 (entity resolution)."""
    cust = load(spark, sf_dir, "customer")
    bkt = md5_bucket(F.col("c_custkey"), _Q176_DIRTY_BUCKETS)
    dirty = cust.select(
        (F.col("c_custkey") + 100000).alias("d_key"),
        F.col("c_custkey").alias("true_key"),
        F.when(
            bkt == 0,
            F.expr(
                "substring(c_name, 1, greatest(length(c_name) - 3, 1))"
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.when(bkt == 1, F.col("c_acctbal") + 1.00)
        .otherwise(F.col("c_acctbal"))
        .alias("d_acctbal"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
    )
    agree = (
        cust.join(
            dirty,
            (F.col("d_nationkey") == F.col("c_nationkey"))
            & (F.col("d_mktsegment") == F.col("c_mktsegment"))
            & (
                F.substring("d_name", 1, 1) == F.substring("c_name", 1, 1)
            ),
        )
        .select(
            "c_custkey",
            "d_key",
            (F.col("true_key") == F.col("c_custkey")).alias("is_match"),
            F.when(F.col("d_name") == F.col("c_name"), 1)
            .otherwise(0)
            .alias("a_name"),
            F.when(
                F.substring("d_name", 1, 8) == F.substring("c_name", 1, 8), 1
            )
            .otherwise(0)
            .alias("a_prefix"),
            F.when(
                F.abs(F.col("d_acctbal") - F.col("c_acctbal")) <= 1.005, 1
            )
            .otherwise(0)
            .alias("a_bal"),
        )
    )
    mu_aggs = [F.count("*").cast("long").alias("n_pairs")]
    mu_aggs.append(
        F.sum(F.when(F.col("is_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_match")
    )
    mu_aggs.append(
        F.sum(F.when(F.col("is_match"), 0).otherwise(1))
        .cast("long")
        .alias("n_non")
    )
    for f in _Q176_FIELDS:
        mu_aggs.append(
            F.sum(F.when(F.col("is_match"), F.col(f"a_{f}")).otherwise(0))
            .cast("long")
            .alias(f"m_{f}")
        )
        mu_aggs.append(
            F.sum(F.when(F.col("is_match"), 0).otherwise(F.col(f"a_{f}")))
            .cast("long")
            .alias(f"u_{f}")
        )
    mu = agree.agg(*mu_aggs)
    wcols = ["n_match", "n_non"]
    wexprs = []
    for f in _Q176_FIELDS:
        wexprs.append(
            F.round(
                F.log(
                    ((F.col(f"m_{f}") + 1.0) / (F.col("n_match") + 2.0))
                    / ((F.col(f"u_{f}") + 1.0) / (F.col("n_non") + 2.0))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias(f"wa_{f}")
        )
        wexprs.append(
            F.round(
                F.log(
                    (1.0 - (F.col(f"m_{f}") + 1.0) / (F.col("n_match") + 2.0))
                    / (1.0 - (F.col(f"u_{f}") + 1.0) / (F.col("n_non") + 2.0))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias(f"wd_{f}")
        )
    w = mu.select(*wcols, *wexprs)
    score = None
    for f in _Q176_FIELDS:
        term = F.when(F.col(f"a_{f}") == 1, F.col(f"wa_{f}")).otherwise(
            F.col(f"wd_{f}")
        )
        score = term if score is None else score + term
    return agree.crossJoin(F.broadcast(w)).select(
        "c_custkey",
        "d_key",
        "is_match",
        score.cast("double").alias("score"),
        "n_match",
        "n_non",
    )


@register("q176_fellegi_sunter_linkage", oracle=_q176_oracle())
def q176_fellegi_sunter_linkage(spark, sf_dir):
    scored = fs_scored_pairs(spark, sf_dir).select(
        "is_match", "score", "n_match", "n_non"
    )
    thresholds = F.explode(
        F.array(*[F.lit(t) for t in _Q176_THRESHOLDS])
    ).alias("threshold")
    return (
        scored.select("*", thresholds)
        .groupBy("threshold", "n_match", "n_non")
        .agg(
            F.sum(
                F.when((F.col("score") >= F.col("threshold")) & F.col("is_match"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    (F.col("score") >= F.col("threshold")) & ~F.col("is_match"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when((F.col("score") < F.col("threshold")) & F.col("is_match"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fn"),
            F.sum(
                F.when(
                    (F.col("score") < F.col("threshold")) & ~F.col("is_match"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("tn"),
        )
        .select(
            F.col("threshold").cast("long").alias("threshold"),
            "n_match",
            "n_non",
            "tp",
            "fp",
            "fn",
            "tn",
        )
    )


# --------------------------------------------------------------------------
_Q177_SAMPLE_BUCKETS = 8
_Q177_QUERY_MOD = 7
_Q177_K = 4

_Q177_COS_SQL = """
  CAST(ROUND(1000000.0 * list_sum(list_transform(range(1, 65),
         i -> a.embedding[i] * b.embedding[i]))
       / (sqrt(list_sum(list_transform(range(1, 65),
            i -> a.embedding[i] * a.embedding[i])))
        * sqrt(list_sum(list_transform(range(1, 65),
            i -> b.embedding[i] * b.embedding[i]))))) AS BIGINT)
"""

_Q177_ORACLE = f"""
WITH s AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE {md5_bucket_sql("vec_id", _Q177_SAMPLE_BUCKETS)} = 0
),
cos AS (
  SELECT a.vec_id AS x, b.vec_id AS y, {_Q177_COS_SQL} AS cos_u
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
avgk AS (
  SELECT x, CAST(SUM(cos_u) // {_Q177_K} AS BIGINT) AS avgk_u
  FROM (
    SELECT x, cos_u,
           ROW_NUMBER() OVER (PARTITION BY x ORDER BY cos_u DESC, y) AS rn
    FROM cos
  ) WHERE rn <= {_Q177_K}
  GROUP BY x
),
queries AS (
  SELECT vec_id AS q FROM s WHERE vec_id % {_Q177_QUERY_MOD} = 0
),
scored AS (
  SELECT c.x AS q, c.y, c.cos_u,
         2 * c.cos_u - ax.avgk_u - ay.avgk_u AS margin_u
  FROM cos c
  JOIN queries ON queries.q = c.x
  JOIN avgk ax ON ax.x = c.x
  JOIN avgk ay ON ay.x = c.y
),
raw_top AS (
  SELECT q, y AS raw_top, cos_u AS raw_cos_u FROM (
    SELECT q, y, cos_u,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_u DESC, y) AS rn
    FROM scored
  ) WHERE rn = 1
),
margin_top AS (
  SELECT q, y AS margin_top, margin_u FROM (
    SELECT q, y, margin_u,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY margin_u DESC, y) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT r.q AS query_id, r.raw_top, r.raw_cos_u,
       m.margin_top, m.margin_u,
       (r.raw_top <> m.margin_top) AS changed
FROM raw_top r JOIN margin_top m ON m.q = r.q
"""


@register("q177_margin_alignment", oracle=_Q177_ORACLE)
def q177_margin_alignment(spark, sf_dir):
    from sparkextract.queries.base import checkpoint_memo

    def build():
        s = (
            load(spark, sf_dir, "embeddings")
            .where(md5_bucket(F.col("vec_id"), _Q177_SAMPLE_BUCKETS) == 0)
            .select("vec_id", "embedding")
        )
        dot = F.aggregate(
            F.zip_with("a.embedding", "b.embedding", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        norm = lambda side: F.sqrt(  # noqa: E731
            F.aggregate(
                F.transform(f"{side}.embedding", lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        # ONE snap to micro-units: everything downstream is pure int64
        cos_u = F.round(F.lit(1000000.0) * dot / (norm("a") * norm("b"))).cast(
            "long"
        )
        return (
            s.alias("a")
            .join(F.broadcast(s.alias("b")), F.col("a.vec_id") != F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("x"),
                F.col("b.vec_id").alias("y"),
                cos_u.alias("cos_u"),
            )
        )

    cos = checkpoint_memo(spark, sf_dir, "q177_cos", build)
    wk = Window.partitionBy("x").orderBy(F.desc("cos_u"), F.asc("y"))
    avgk = (
        cos.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _Q177_K)
        .groupBy("x")
        .agg(F.expr(f"sum(cos_u) div {_Q177_K}").cast("long").alias("avgk_u"))
    )
    scored = (
        cos.where(F.col("x") % _Q177_QUERY_MOD == 0)
        .join(F.broadcast(avgk.withColumnRenamed("x", "xq")), F.col("x") == F.col("xq"))
        .join(
            F.broadcast(
                avgk.select(
                    F.col("x").alias("yq"), F.col("avgk_u").alias("avgk_y")
                )
            ),
            F.col("y") == F.col("yq"),
        )
        .select(
            F.col("x").alias("q"),
            "y",
            "cos_u",
            (2 * F.col("cos_u") - F.col("avgk_u") - F.col("avgk_y")).alias(
                "margin_u"
            ),
        )
    )
    wraw = Window.partitionBy("q").orderBy(F.desc("cos_u"), F.asc("y"))
    wmar = Window.partitionBy("q").orderBy(F.desc("margin_u"), F.asc("y"))
    raw_top = (
        scored.withColumn("rn", F.row_number().over(wraw))
        .where(F.col("rn") == 1)
        .select(
            "q", F.col("y").alias("raw_top"), F.col("cos_u").alias("raw_cos_u")
        )
    )
    margin_top = (
        scored.withColumn("rn", F.row_number().over(wmar))
        .where(F.col("rn") == 1)
        .select("q", F.col("y").alias("margin_top"), "margin_u")
    )
    return raw_top.join(margin_top, "q").select(
        F.col("q").alias("query_id"),
        "raw_top",
        "raw_cos_u",
        "margin_top",
        "margin_u",
        (F.col("raw_top") != F.col("margin_top")).alias("changed"),
    )


# --------------------------------------------------------------------------
_Q178_B = 8  # sequences per batch
_Q178_NBUCKETS = 4


def _q178_policy_sql(tag: str, order: str) -> str:
    return f"""
  SELECT '{tag}' AS policy,
         CAST(COUNT(DISTINCT batch) AS BIGINT) AS n_batches,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(mx) - SUM(n_tokens) AS BIGINT) AS padded_tokens,
         (1000000 * (SUM(mx) - SUM(n_tokens))) // SUM(mx) AS waste_u
  FROM (
    SELECT n_tokens, batch, MAX(n_tokens) OVER (PARTITION BY batch) AS mx
    FROM (
      SELECT n_tokens,
             (ROW_NUMBER() OVER (ORDER BY {order}) - 1) // {_Q178_B} AS batch
      FROM lens
    )
  )"""


_Q178_ORACLE = f"""
WITH lens AS (
  SELECT doc_id, CAST(n_chars // 4 AS BIGINT) AS n_tokens,
         ntile({_Q178_NBUCKETS})
           OVER (ORDER BY n_chars // 4, doc_id) AS lbucket
  FROM documents
)
{_q178_policy_sql("arrival", "doc_id")}
UNION ALL
{_q178_policy_sql("length_sorted", "n_tokens, doc_id")}
UNION ALL
{_q178_policy_sql("bucketed", "lbucket, doc_id")}
"""


@register("q178_padding_waste_audit", oracle=_Q178_ORACLE)
def q178_padding_waste_audit(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lens = docs.select(
        "doc_id",
        F.expr("n_chars div 4").cast("long").alias("n_tokens"),
    ).withColumn(
        "lbucket",
        F.ntile(_Q178_NBUCKETS).over(
            Window.orderBy(F.col("n_tokens"), F.col("doc_id"))
        ),
    )
    frames = []
    for tag, order in [
        ("arrival", "doc_id"),
        ("length_sorted", "n_tokens, doc_id"),
        ("bucketed", "lbucket, doc_id"),
    ]:
        batched = lens.withColumn(
            "batch",
            F.expr(
                f"(row_number() over (order by {order}) - 1) div {_Q178_B}"
            ),
        )
        rolled = batched.withColumn(
            "mx", F.max("n_tokens").over(Window.partitionBy("batch"))
        ).agg(
            F.lit(tag).alias("policy"),
            F.countDistinct("batch").cast("long").alias("n_batches"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.sum("mx") - F.sum("n_tokens")).cast("long").alias("padded_tokens"),
            F.expr(
                f"(1000000 * (sum(mx) - sum(n_tokens))) div sum(mx)"
            ).alias("waste_u"),
        )
        frames.append(rolled)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
