"""Round-5 continuation wave 26: physical-layout advisory queries —
the planning arithmetic BEHIND the engine's own partitioning choices,
exposed as auditable tables.

q200 — PARTITION-SIZING & SALT ADVISOR. The north-star pipeline
"repartitions by doc_id hash with salting for skewed mega-documents";
q42/q167 EXECUTE that strategy — this query derives its parameters
from data, per source: exact p50/p99/max document size (value-grain
CDF walk, the q197 technique — no corpus-sized sort), total bytes,
the recommended partition count ceil(total / target), and whether the
source needs salting (any document exceeding the mega threshold =
target / 8, the same constant family as extract_mega_skew). All
integer arithmetic; the one string column is the advisory verdict.
Reference intent: the reference processes one PDF at a time and never
plans; this is the table its Spark replacement reads to SET
spark.sql.files.maxPartitionBytes / salt factors per ingest source.

Scale shape: groupBy(source, n_chars) mergeable counts (value grain),
prefix-sum windows PARTITIONED BY source over the value grain, then a
|sources|-row advisory rollup. No global sort, no corpus-sized window.

q201 — COMPRESSION-PROXY TEMPLATE AUDIT. Fraction of repeated 8-gram
INSTANCES inside each source (1 - distinct/total) — the cheap proxy
for zstd-dictionary compressibility and templated/boilerplate content
used to pick which sources get dictionary compression and which feed
the q160 template profiler. Exact integer micro-units.

Scale shape: one explode -> two-level mergeable agg ((source, gram)
then source). Map-side combine absorbs hot grams; nothing else.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, register

# ---------------------------------------------------------------------
# q200
_Q200_TARGET = 200_000  # target partition payload (chars-as-bytes proxy)
_Q200_MEGA = _Q200_TARGET // 8  # mega-document threshold


_Q200_ORACLE = f"""
WITH vals AS (
  SELECT source, CAST(n_chars AS BIGINT) AS sz,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, n_chars
),
cdf AS (
  SELECT source, sz, c,
         CAST(SUM(c) OVER (PARTITION BY source ORDER BY sz) AS BIGINT) AS cum
  FROM vals
),
tot AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(SUM(sz * c) AS BIGINT) AS total_bytes,
         CAST(MAX(sz) AS BIGINT) AS max_bytes,
         CAST(SUM(CASE WHEN sz > {_Q200_MEGA} THEN c ELSE 0 END) AS BIGINT)
           AS n_mega
  FROM vals GROUP BY source
),
pcts AS (
  SELECT c.source,
         CAST(MIN(CASE WHEN c.cum * 2 >= t.n_docs THEN c.sz END) AS BIGINT)
           AS p50_bytes,
         CAST(MIN(CASE WHEN c.cum * 100 >= t.n_docs * 99 THEN c.sz END)
              AS BIGINT) AS p99_bytes
  FROM cdf c JOIN tot t ON t.source = c.source
  GROUP BY c.source
)
SELECT t.source, t.n_docs, t.total_bytes, p.p50_bytes, p.p99_bytes,
       t.max_bytes, t.n_mega,
       CAST((t.total_bytes + {_Q200_TARGET} - 1) // {_Q200_TARGET} AS BIGINT)
         AS rec_partitions,
       t.n_mega > 0 AS needs_salting,
       CASE WHEN t.n_mega > 0
            THEN 'salt:' || CAST((t.max_bytes + {_Q200_MEGA} - 1)
                                 // {_Q200_MEGA} AS VARCHAR)
            ELSE 'hash' END AS advisory
FROM tot t JOIN pcts p ON p.source = t.source
"""


@register("q200_partition_advisor", oracle=_Q200_ORACLE)
def q200_partition_advisor(spark, sf_dir):
    vals = (
        load(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").cast("long").alias("sz"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("sz")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = vals.select(
        "source", "sz", "c", F.sum("c").over(wc).cast("long").alias("cum")
    )
    tot = vals.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.col("sz") * F.col("c")).cast("long").alias("total_bytes"),
        F.max("sz").cast("long").alias("max_bytes"),
        F.sum(F.when(F.col("sz") > _Q200_MEGA, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_mega"),
    )
    pcts = (
        cdf.join(tot.select("source", "n_docs"), "source")
        .groupBy("source")
        .agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n_docs"), F.col("sz")))
            .cast("long")
            .alias("p50_bytes"),
            F.min(F.when(F.col("cum") * 100 >= F.col("n_docs") * 99, F.col("sz")))
            .cast("long")
            .alias("p99_bytes"),
        )
    )
    adv = F.when(
        F.col("n_mega") > 0,
        F.concat(
            F.lit("salt:"),
            F.expr(f"(max_bytes + {_Q200_MEGA} - 1) div {_Q200_MEGA}").cast("string"),
        ),
    ).otherwise(F.lit("hash"))
    return (
        tot.join(pcts, "source")
        .select(
            "source",
            "n_docs",
            "total_bytes",
            "p50_bytes",
            "p99_bytes",
            "max_bytes",
            "n_mega",
            F.expr(f"(total_bytes + {_Q200_TARGET} - 1) div {_Q200_TARGET}")
            .cast("long")
            .alias("rec_partitions"),
            (F.col("n_mega") > 0).alias("needs_salting"),
            adv.alias("advisory"),
        )
    )


# ---------------------------------------------------------------------
# q201
_Q201_N = 8  # gram width

_Q201_ORACLE = f"""
WITH grams AS (
  SELECT source, gram FROM (
    SELECT source,
           unnest(list_transform(range(1, len(a) - {_Q201_N} + 2),
                  i -> array_to_string(a[i:i+{_Q201_N - 1}], ' '))) AS gram
    FROM (SELECT source,
                 list_filter(string_split(text, ' '), t -> t <> '') AS a
          FROM documents)
    WHERE len(a) >= {_Q201_N})
),
per_gram AS (
  SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS c
  FROM grams GROUP BY source, gram
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_instances,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_repeated,
       CAST((1000000 * (SUM(c) - COUNT(*))) // SUM(c) AS BIGINT)
         AS repeat_frac_u,
       (1000000 * (SUM(c) - COUNT(*))) // SUM(c) >= 300000 AS dict_worthy
FROM per_gram
GROUP BY source
"""


@register("q201_compression_proxy", oracle=_Q201_ORACLE)
def q201_compression_proxy(spark, sf_dir):
    a = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    gram = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("a") - _Q201_N + 1, F.lit(0))),
        lambda i: F.array_join(F.slice("a", i, _Q201_N), " "),
    )
    grams = (
        load(spark, sf_dir, "documents")
        .select("source", a.alias("a"))
        .filter(F.size("a") >= _Q201_N)
        .select("source", F.explode(gram).alias("gram"))
    )
    per_gram = grams.groupBy("source", "gram").agg(
        F.count("*").cast("long").alias("c")
    )
    rep = F.expr("(1000000 * (n_instances - n_distinct)) div n_instances")
    return (
        per_gram.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_instances"),
            F.count("*").cast("long").alias("n_distinct"),
            (F.sum("c") - F.count("*")).cast("long").alias("n_repeated"),
        )
        .select(
            "source",
            "n_instances",
            "n_distinct",
            "n_repeated",
            rep.cast("long").alias("repeat_frac_u"),
            (rep >= 300000).alias("dict_worthy"),
        )
    )
