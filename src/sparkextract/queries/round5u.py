"""Round-5 continuation wave 19: corpus-coverage estimation and
graph-based cluster validation.

q186 — CHAO1 + GOOD-TURING VOCABULARY RICHNESS (Chao 1984; Good 1953).
The corpus-analytics question every tokenizer/vocab decision starts
with: how much of the language's vocabulary has this crawl actually
seen? Per language: observed type count V, token count N, singleton
f1 and doubleton f2 type counts give the Chao1 lower-bound estimate of
TOTAL vocabulary V + f1*(f1-1)/(2*(f2+1)) and the Good-Turing estimate
of unseen probability mass f1/N (= chance the next token is a new
type). All outputs are exact integer micro-units — no floats anywhere.
Reference intent: corpus-level summary statistics over extracted text,
/root/reference/src/pdf_extraction/text_processor.py word/char counts
generalized to type-frequency-of-frequency statistics.

Scale shape: explode -> (lang, token)-grain mergeable count (map-side
combine absorbs the token skew) -> lang-grain mergeable agg over the
vocab-sized frame. No join, no window, no Python; both aggregations
are partial-aggregate friendly, so at 100 TB this is one shuffle of
vocab-sized data plus one of |langs| rows.

q187 — GRAPH MODULARITY CLUSTER-QUALITY AUDIT (Newman & Girvan 2004).
Validates a partition AGAINST a similarity graph it was not derived
from: the q131/q52 seed-centroid k-means cells (the partition) are
scored against the q53-style banded-LSH cosine graph over the same
quantized embeddings (the structure). Per cell c: modularity
contribution e_c/m - (d_c/(2m))^2 where e_c = edges inside c, d_c =
degree sum of c's nodes, m = total edges; sum over cells = Newman Q in
[-1/2, 1). Unlike q71's components (where every edge is intra-cluster
by construction and Q degenerates), the centroid partition is
independent of the edge set, so Q genuinely measures whether nearest-
centroid cells capture the LSH similarity structure. e_c, d_c, m are
exact BIGINTs; the contribution is two IEEE divisions + one multiply +
one subtract on exact integers, ROUND(,6)-frozen (the repo's
float-compare discipline).
Reference intent: embedding-space diagnostics over the pgvector store,
/root/reference/src/rag/vector_database.py:156-189, upgraded from
per-point distances to partition-level structure validation.

Scale shape: candidate pairs come from the q53 banded-LSH equi-join
(bucket-keyed shuffle-hash, never all-pairs); the assignment is an
8-row broadcast cross join + vec_id-keyed argmin window; pairs and
assignment are localCheckpoint-memoized because three sibling subtrees
(degrees, intra-cell edges, edge total) consume each — AQE exchange
reuse does not fire across sibling subtrees (q68 lesson, base.py).
Per-cell rollups are k-group mergeable aggs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import checkpoint_memo, load, register
from sparkextract.queries.dedup2 import (
    _band_sig_col,
    _band_sig_sql,
    _BANDS,
    _DIM,
    _dot,
    _norm,
)

# ---------------------------------------------------------------------
# q186
_Q186_ORACLE = """
WITH toks AS (
  SELECT lang,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
  FROM documents
),
tc AS (
  SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY lang, t
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS v_obs,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       CAST(1000000 * COUNT(*)
            + (1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1))
              // (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
            AS BIGINT) AS chao1_u,
       CAST((1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // SUM(c)
            AS BIGINT) AS p0_u,
       CAST(1000000
            - (1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // SUM(c)
            AS BIGINT) AS coverage_u
FROM tc
GROUP BY lang
"""


@register("q186_vocab_richness", oracle=_Q186_ORACLE)
def q186_vocab_richness(spark, sf_dir):
    toks = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    tc = toks.groupBy("lang", "t").agg(F.count("*").cast("long").alias("c"))
    f1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
    f2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long")
    agg = tc.groupBy("lang").agg(
        F.count("*").cast("long").alias("v_obs"),
        F.sum("c").cast("long").alias("n_tokens"),
        f1.alias("f1"),
        f2.alias("f2"),
    )
    chao1 = F.expr("1000000 * v_obs + (1000000 * f1 * (f1 - 1)) div (2 * (f2 + 1))")
    p0 = F.expr("(1000000 * f1) div n_tokens")
    return agg.select(
        "lang",
        "v_obs",
        "n_tokens",
        "f1",
        "f2",
        chao1.cast("long").alias("chao1_u"),
        p0.cast("long").alias("p0_u"),
        (F.lit(1000000) - p0).cast("long").alias("coverage_u"),
    )


# ---------------------------------------------------------------------
# q187
_Q187_K = 8  # seed centroids: quantized vectors of vec_id 1..K (q131)
_Q187_MIN_COS = 0.2  # edge keep threshold over LSH candidate pairs

_Q187_COS = (
    f"list_sum(list_transform(range(1, {_DIM + 1}), i -> cx.e[i] * cy.e[i]))"
    f" / ( sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> cx.e[i] * cx.e[i])))"
    f"   * sqrt(list_sum(list_transform(range(1, {_DIM + 1}), i -> cy.e[i] * cy.e[i]))) )"
)

_Q187_ORACLE = f"""
WITH eq AS (
  SELECT vec_id,
         list_transform(embedding, x -> ROUND(CAST(x AS DOUBLE), 3)) AS e
  FROM embeddings
),
cents AS (SELECT vec_id AS cent_id, e AS c FROM eq
          WHERE vec_id BETWEEN 1 AND {_Q187_K}),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT d.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id ORDER BY
             list_sum(list_transform(range(1, {_DIM + 1}),
               i -> (d.e[i] - c.c[i]) * (d.e[i] - c.c[i]))) ASC,
             c.cent_id ASC) AS rn
    FROM eq d, cents c
    WHERE d.vec_id > {_Q187_K}
  ) WHERE rn = 1
),
sigs AS (
  SELECT vec_id, e,
         [{", ".join(f"CAST({_band_sig_sql(b)} AS INTEGER)" for b in range(_BANDS))}] AS s
  FROM eq WHERE vec_id > {_Q187_K}
),
buckets AS (
  SELECT vec_id, band, s[band + 1] AS sig
  FROM sigs, (SELECT UNNEST(range({_BANDS})) AS band)
),
cand AS (
  SELECT DISTINCT x.vec_id AS l, y.vec_id AS r
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
),
pairs AS (
  SELECT p.l, p.r
  FROM cand p
  JOIN (SELECT vec_id, e FROM eq) cx ON p.l = cx.vec_id
  JOIN (SELECT vec_id, e FROM eq) cy ON p.r = cy.vec_id
  WHERE ROUND({_Q187_COS}, 6) >= {_Q187_MIN_COS}
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT l AS node FROM pairs UNION ALL SELECT r FROM pairs
  ) GROUP BY node
),
cell_nodes AS (
  SELECT a.cell,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(COALESCE(d.deg, 0)) AS BIGINT) AS deg_sum
  FROM assign a LEFT JOIN deg d ON d.node = a.vec_id
  GROUP BY a.cell
),
cell_edges AS (
  SELECT al.cell, CAST(COUNT(*) AS BIGINT) AS e_within
  FROM pairs p
  JOIN assign al ON al.vec_id = p.l
  JOIN assign ar ON ar.vec_id = p.r
  WHERE al.cell = ar.cell
  GROUP BY al.cell
)
SELECT CAST(cn.cell AS BIGINT) AS cell, cn.n_nodes, cn.deg_sum,
       CAST(COALESCE(ce.e_within, 0) AS BIGINT) AS e_within,
       m.m AS m_edges,
       ROUND(CASE WHEN m.m = 0 THEN 0.0
             ELSE CAST(COALESCE(ce.e_within, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
                  - (CAST(cn.deg_sum AS DOUBLE) / CAST(2 * m.m AS DOUBLE))
                    * (CAST(cn.deg_sum AS DOUBLE) / CAST(2 * m.m AS DOUBLE))
             END, 6) AS q_contrib
FROM cell_nodes cn
LEFT JOIN cell_edges ce ON ce.cell = cn.cell
CROSS JOIN m
"""


def _q187_quantized(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double"), 3)).alias("e"),
    )


def _q187_assign(spark, sf_dir):
    """(vec_id, cell): nearest of the K seed centroids, q131 recipe."""
    eq = _q187_quantized(spark, sf_dir)
    cents = eq.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= _Q187_K)
    ).select(F.col("vec_id").alias("cent_id"), F.col("e").alias("c"))
    d2 = F.aggregate(
        F.zip_with(F.col("e"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cent_id"))
    return (
        eq.filter(F.col("vec_id") > _Q187_K)
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cent_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )


def _q187_pairs(spark, sf_dir):
    """Banded-LSH candidate pairs verified at cosine >= threshold."""
    eq = _q187_quantized(spark, sf_dir).filter(F.col("vec_id") > _Q187_K)
    buckets = eq.withColumn(
        "bs", F.array(*[_band_sig_col(b) for b in range(_BANDS)])
    ).select("vec_id", F.posexplode("bs").alias("band", "sig"))
    x = buckets.hint("shuffle_hash").alias("x")
    y = buckets.hint("shuffle_hash").alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("l"), F.col("y.vec_id").alias("r"))
        .distinct()
    )
    cx = eq.select(F.col("vec_id").alias("l"), F.col("e").alias("ex"))
    cy = eq.select(F.col("vec_id").alias("r"), F.col("e").alias("ey"))
    cosine = F.round(
        _dot(F.col("ex"), F.col("ey")) / (_norm(F.col("ex")) * _norm(F.col("ey"))), 6
    )
    return (
        cand.join(cx, "l")
        .join(cy, "r")
        .filter(cosine >= _Q187_MIN_COS)
        .select("l", "r")
    )


@register("q187_graph_modularity", oracle=_Q187_ORACLE)
def q187_graph_modularity(spark, sf_dir):
    assign = checkpoint_memo(
        spark, sf_dir, "q187_assign", lambda: _q187_assign(spark, sf_dir)
    )
    pairs = checkpoint_memo(
        spark, sf_dir, "q187_pairs", lambda: _q187_pairs(spark, sf_dir)
    )
    m = pairs.agg(F.count("*").cast("long").alias("m_edges"))
    deg = (
        pairs.select(F.col("l").alias("node"))
        .unionAll(pairs.select(F.col("r").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    cell_nodes = (
        assign.join(deg, assign["vec_id"] == deg["node"], "left")
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.coalesce("deg", F.lit(0))).cast("long").alias("deg_sum"),
        )
    )
    al = assign.select(F.col("vec_id").alias("l"), F.col("cell").alias("cl"))
    ar = assign.select(F.col("vec_id").alias("r"), F.col("cell").alias("cr"))
    cell_edges = (
        pairs.join(al, "l")
        .join(ar, "r")
        .filter(F.col("cl") == F.col("cr"))
        .groupBy(F.col("cl").alias("cell"))
        .agg(F.count("*").cast("long").alias("e_within"))
    )
    md = F.col("m_edges").cast("double")
    ew = F.coalesce("e_within", F.lit(0)).cast("long")
    ds = F.col("deg_sum").cast("double")
    contrib = F.when(F.col("m_edges") == 0, F.lit(0.0)).otherwise(
        ew.cast("double") / md - (ds / (2 * md)) * (ds / (2 * md))
    )
    return (
        cell_nodes.join(cell_edges, "cell", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_nodes",
            "deg_sum",
            ew.alias("e_within"),
            "m_edges",
            F.round(contrib, 6).alias("q_contrib"),
        )
    )
