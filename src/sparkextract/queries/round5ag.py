"""Round-5 continuation wave 31: vocabulary pruning economics.

q209 — DF-PRUNING ADVISOR (the min-df sweep every indexer/tokenizer
build runs; cf. scikit-learn's min_df, Lucene's index pruning,
SentencePiece's character_coverage): for each candidate document-
frequency threshold, what fraction of the VOCABULARY disappears and
what fraction of the TOKEN MASS survives? The classic Zipf trade —
dropping df==1 types typically halves the vocabulary while losing a
sliver of mass — quantified exactly: one token-grain (df, mass)
table, one threshold explode, one mergeable rollup. Thresholds
df >= {{1, 2, 5, 10}}; outputs are exact BIGINTs and integer
micro-unit fractions.
Reference intent: the reference builds its retrieval index over all
chunk text (/root/reference/src/rag/vector_database.py); at corpus
scale the index is built over a PRUNED vocabulary and this table is
how the threshold is chosen.

Scale shape: groupBy(token) df+mass (mergeable, map-side combine),
then a x4 threshold explode of the VOCAB-sized frame into a 4-group
mergeable rollup. No windows, no joins beyond a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_Q209_THRESHOLDS = [1, 2, 5, 10]

_Q209_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
  FROM documents
),
tf AS (
  SELECT t,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(COUNT(*) AS BIGINT) AS mass
  FROM toks GROUP BY t
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_total,
         CAST(SUM(mass) AS BIGINT) AS m_total
  FROM tf
),
sweep AS (
  SELECT th.th, tf.df, tf.mass
  FROM tf, (SELECT unnest([{", ".join(str(t) for t in _Q209_THRESHOLDS)}]) AS th) th
)
SELECT CAST(s.th AS BIGINT) AS min_df,
       CAST(SUM(CASE WHEN s.df >= s.th THEN 1 ELSE 0 END) AS BIGINT)
         AS v_kept,
       g.v_total,
       CAST(SUM(CASE WHEN s.df >= s.th THEN s.mass ELSE 0 END) AS BIGINT)
         AS mass_kept,
       g.m_total,
       CAST((1000000 * SUM(CASE WHEN s.df >= s.th THEN 1 ELSE 0 END))
            // g.v_total AS BIGINT) AS v_kept_frac_u,
       CAST((1000000 * SUM(CASE WHEN s.df >= s.th THEN s.mass ELSE 0 END))
            // g.m_total AS BIGINT) AS mass_kept_frac_u
FROM sweep s CROSS JOIN g
GROUP BY s.th, g.v_total, g.m_total
"""


@register("q209_df_pruning_advisor", oracle=_Q209_ORACLE)
def q209_df_pruning_advisor(spark, sf_dir):
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    tf = toks.groupBy("t").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("mass"),
    )
    g = tf.agg(
        F.count("*").cast("long").alias("v_total"),
        F.sum("mass").cast("long").alias("m_total"),
    )
    sweep = tf.select(
        "df",
        "mass",
        F.explode(F.array(*[F.lit(t) for t in _Q209_THRESHOLDS])).alias("th"),
    )
    kept = F.sum(F.when(F.col("df") >= F.col("th"), 1).otherwise(0))
    mkept = F.sum(F.when(F.col("df") >= F.col("th"), F.col("mass")).otherwise(0))
    return (
        sweep.groupBy("th")
        .agg(
            kept.cast("long").alias("v_kept"),
            mkept.cast("long").alias("mass_kept"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            F.col("th").cast("long").alias("min_df"),
            "v_kept",
            "v_total",
            "mass_kept",
            "m_total",
            F.expr("(1000000 * v_kept) div v_total").cast("long").alias("v_kept_frac_u"),
            F.expr("(1000000 * mass_kept) div m_total")
            .cast("long")
            .alias("mass_kept_frac_u"),
        )
    )
