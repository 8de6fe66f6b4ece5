"""Round-5 continuation wave 18: association-rule mining.

q185 — A-PRIORI ASSOCIATION RULES (Agrawal & Srikant 1994). The
classic frequent-itemset primitive next to q88's PMI: frequent single
tokens (document frequency >= minsup = N/5) are found first, each
document's token set is PRUNED to frequent items BEFORE any pair is
generated (the A-priori candidate reduction — candidates whose
subsets are infrequent never exist), doc-local pair generation runs
over the pruned sorted set (q88's nested transform/slice — no
self-join shuffle), and frequent pairs (df_ab >= minsup) become rules
a->b and b->a kept at confidence >= 0.5. Confidence and lift are
exact integer micro-units: conf_u = 1e6*df_ab div df_antecedent,
lift_u = 1e6*df_ab*N div (df_a*df_b). Scale shape: the frequent-item
set is a mergeable count + broadcast semi-join, pair counting is one
pair-keyed mergeable groupBy over doc-local candidates, and rule
scoring joins only the (tiny) frequent-pair table against the (tiny)
frequent-item table — both broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_Q185_SUP_DEN = 5  # minsup = N // 5 documents
_Q185_MINCONF_U = 500_000  # confidence >= 0.5

_Q185_ORACLE = f"""
WITH n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(*) // {_Q185_SUP_DEN} AS BIGINT) AS minsup
  FROM documents
),
sets AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(string_split(text, ' '),
                                             x -> x <> ''))) AS s
  FROM documents
),
dt AS (SELECT doc_id, unnest(s) AS tok FROM sets),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
  FROM dt GROUP BY tok
  HAVING COUNT(*) >= (SELECT minsup FROM n)
),
pruned AS (
  SELECT doc_id, list_sort(list(tok)) AS s
  FROM dt WHERE tok IN (SELECT tok FROM freq)
  GROUP BY doc_id
),
pair_df AS (
  SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS df_ab
  FROM (
    SELECT s[i] AS tok_a, s[j] AS tok_b
    FROM pruned,
         LATERAL (SELECT unnest(range(1, len(s) + 1)) AS i),
         LATERAL (SELECT unnest(range(1, len(s) + 1)) AS j)
    WHERE i < j
  )
  GROUP BY tok_a, tok_b
  HAVING COUNT(*) >= (SELECT minsup FROM n)
),
rules AS (
  SELECT tok_a AS antecedent, tok_b AS consequent, df_ab FROM pair_df
  UNION ALL
  SELECT tok_b, tok_a, df_ab FROM pair_df
)
SELECT r.antecedent, r.consequent,
       fa.df AS df_ante, fb.df AS df_cons, r.df_ab,
       (1000000 * r.df_ab) // fa.df AS conf_u,
       (1000000 * r.df_ab * n.n_docs) // (fa.df * fb.df) AS lift_u
FROM rules r
JOIN freq fa ON fa.tok = r.antecedent
JOIN freq fb ON fb.tok = r.consequent
CROSS JOIN n
WHERE (1000000 * r.df_ab) // fa.df >= {_Q185_MINCONF_U}
"""


@register("q185_association_rules", oracle=_Q185_ORACLE)
def q185_association_rules(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(f"count(*) div {_Q185_SUP_DEN}").cast("long").alias("minsup"),
    )
    sets = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda t: t != F.lit(""))
            )
        ).alias("s"),
    )
    dt = sets.select("doc_id", F.explode("s").alias("tok"))
    freq = (
        dt.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n.select("minsup")))
        .where(F.col("df") >= F.col("minsup"))
        .select("tok", "df")
    )
    # A-priori pruning: each doc's set shrinks to frequent items BEFORE
    # pair generation, so no candidate with an infrequent subset exists
    pruned = (
        dt.join(F.broadcast(freq.select("tok")), "tok")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("tok")).alias("s"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("s"),
            lambda x, i: F.transform(
                F.slice(F.col("s"), i + 2, F.size("s")),
                lambda y: F.concat_ws(" ", x, y),
            ),
        )
    )
    pair_df = (
        pruned.select(F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("df_ab"))
        .crossJoin(F.broadcast(n.select("minsup")))
        .where(F.col("df_ab") >= F.col("minsup"))
        .select(
            F.substring_index("pair", " ", 1).alias("tok_a"),
            F.substring_index("pair", " ", -1).alias("tok_b"),
            "df_ab",
        )
    )
    rules = pair_df.select(
        F.col("tok_a").alias("antecedent"),
        F.col("tok_b").alias("consequent"),
        "df_ab",
    ).unionByName(
        pair_df.select(
            F.col("tok_b").alias("antecedent"),
            F.col("tok_a").alias("consequent"),
            "df_ab",
        )
    )
    fa = freq.select(F.col("tok").alias("antecedent"), F.col("df").alias("df_ante"))
    fb = freq.select(F.col("tok").alias("consequent"), F.col("df").alias("df_cons"))
    return (
        rules.join(F.broadcast(fa), "antecedent")
        .join(F.broadcast(fb), "consequent")
        .crossJoin(F.broadcast(n.select("n_docs")))
        .select(
            "antecedent",
            "consequent",
            "df_ante",
            "df_cons",
            "df_ab",
            F.expr("(1000000 * df_ab) div df_ante").alias("conf_u"),
            F.expr("(1000000 * df_ab * n_docs) div (df_ante * df_cons)").alias(
                "lift_u"
            ),
        )
        .where(F.col("conf_u") >= _Q185_MINCONF_U)
    )
