"""Round-5 continuation wave 6: crawl-policy and dedup-economics
operators — domain-suffix blocklist enforcement, soft-dedup loss
weighting, and per-source template/boilerplate profiling.

q158 — DOMAIN-SUFFIX BLOCKLIST JOIN. Crawl governance blocks domains by
SUFFIX ("*.site7.com", a whole TLD, one exact host): a host matches an
entry iff it equals the entry or ends with '.' + entry — label-boundary
semantics, never substring. The scalable form is NOT a LIKE-join (a
non-equi join Spark would nested-loop): each host explodes into its
<= depth label-suffixes ('h1.site7.com' -> {'h1.site7.com',
'site7.com', 'com'}, bounded fan-out), and matching becomes a plain
EQUI-join against the broadcast blocklist. Hosts are synthesized
deterministically from doc_id (3-level, the q98/q149 URL protocol).
Reference analog: the per-source skip-list config gate
(/root/reference/src/config/settings.py) lifted to web-crawl grain.
Scale shape: suffix explode is map-side (<= 3 rows per doc); the
blocklist (5 rows) broadcasts; the rollup is one map-side-combinable
groupBy(entry). Zero corpus-keyed shuffles beyond the final tiny agg.

q159 — SOFT DEDUPLICATION / INVERSE-MULTIPLICITY LOSS WEIGHTS. Instead
of DROPPING exact duplicates (q11), SoftDeDup-style training keeps them
and down-weights: every doc in an exact-hash cluster of size c gets
loss weight 1/c, so each unique content contributes one unit of
gradient mass regardless of copy count. Weights are exact integers
(1_000_000 div c — BIGINT floor division, identical in both engines);
the per-source ledger reports raw vs effective token mass and the
duplicated-doc count, i.e. exactly how much gradient the corpus was
over-counting before weighting. Exact clones are injected (the
q144/q146 protocol): every 10th doc also appears verbatim under the
synthetic 'mirror' source — the scraped-mirror shape soft-dedup is
for — so clusters of size 2 span sources and the mirror's ledger row
shows ~50% effective mass.
Scale shape: ONE map-side-combinable groupBy(text_hash) for cluster
sizes, ONE hash-keyed equi-join back to the doc grain (both partial-agg
friendly; a boilerplate mega-cluster is one ROW in the size table, not
a window partition), ONE groupBy(source) ledger.

q160 — TEMPLATE / BOILERPLATE PROFILING PER SOURCE. Crawl sources that
stamp every page from a template share their opening tokens; the
standard cheap detector profiles the 2-token PREFIX distribution per
source: how many distinct prefixes, the largest prefix class, and the
share of docs whose prefix is shared with another doc of the SAME
source (template_share). High share + low distinct-prefix count flags
a templated source before any expensive near-dup pass runs (this is
the triage query that decides whether q96's block dedup is worth
scheduling for a source). All integers; one final snapped division.
Scale shape: two STACKED map-side-combinable groupBys — (source,
prefix) then (source) — the canonical two-level reduction; no joins,
no windows, nothing content-keyed survives to the second level.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

# --------------------------------------------------------------------------
# q158: domain-suffix blocklist via bounded suffix explode + broadcast join

_Q158_HOSTS_SQL = """
  SELECT doc_id,
         'h' || CAST(doc_id % 5 AS VARCHAR)
           || '.site' || CAST(doc_id % 23 AS VARCHAR)
           || '.' || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                      ELSE 'net' END) AS host
  FROM documents
"""

_Q158_BLOCKLIST = (
    "org",            # a whole TLD
    "site7.com",      # a registrable domain (all its hosts)
    "site16.net",     # another, on the third TLD
    "h2.site11.net",  # one exact host
    "absent.example", # never matches — proves no-hit entries still report
)

_Q158_BL_SQL = " UNION ALL ".join(
    f"SELECT '{e}' AS entry" for e in _Q158_BLOCKLIST
)

_Q158_ORACLE = f"""
WITH hosts AS ({_Q158_HOSTS_SQL}),
suffixes AS (
  SELECT doc_id, host,
         array_to_string(labels[i:], '.') AS suffix
  FROM (
    SELECT doc_id, host, string_split(host, '.') AS labels FROM hosts
  ), UNNEST(generate_series(1, len(labels))) AS t(i)
),
bl AS ({_Q158_BL_SQL}),
hits AS (
  SELECT bl.entry, s.doc_id
  FROM bl LEFT JOIN suffixes s ON s.suffix = bl.entry
)
SELECT entry,
       CAST(COUNT(doc_id) AS BIGINT) AS n_blocked,
       CAST(COALESCE(MIN(doc_id), -1) AS BIGINT) AS min_doc
FROM hits GROUP BY entry
"""


@register("q158_suffix_blocklist", oracle=_Q158_ORACLE)
def q158_suffix_blocklist(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(
        F.lit("h"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".site"),
        (F.col("doc_id") % 23).cast("string"),
        F.lit("."),
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("net"),
    )
    labeled = docs.select("doc_id", F.split(host, "\\.").alias("labels"))
    # bounded map-side fan-out: one row per label-suffix (<= host depth)
    suffixes = labeled.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("labels") - 1),
                lambda i: F.array_join(
                    F.slice(
                        F.col("labels"), i + 1, F.size("labels") - i
                    ),
                    ".",
                ),
            )
        ).alias("suffix"),
    )
    bl = spark.createDataFrame(
        [(e,) for e in _Q158_BLOCKLIST], "entry string"
    )
    # corpus-side match is an INNER BroadcastHashJoin (Spark cannot
    # broadcast the preserved side of an outer join); no-hit entries are
    # restored by a 5-row x 5-row left join afterwards
    hits = (
        suffixes.join(
            F.broadcast(bl), suffixes["suffix"] == bl["entry"], "inner"
        )
        .groupBy("entry")
        .agg(
            F.count("doc_id").cast("long").alias("nb"),
            F.min("doc_id").cast("long").alias("md"),
        )
    )
    return bl.join(hits, "entry", "left").select(
        "entry",
        F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias("n_blocked"),
        F.coalesce(F.col("md"), F.lit(-1)).cast("long").alias("min_doc"),
    )


# --------------------------------------------------------------------------
# q159: soft-dedup inverse-multiplicity weights -> per-source ledger

_Q159_EVERY = 10
_Q159_ID_OFFSET = 4_000_000

_Q159_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {_Q159_ID_OFFSET} AS doc_id, 'mirror' AS source, text
  FROM documents WHERE doc_id % {_Q159_EVERY} = 0
),
d AS (
  SELECT doc_id, source, md5(text) AS h,
         CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM corpus
),
cl AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY h),
weighted AS (
  SELECT d.source, d.n_tokens, cl.c,
         CAST(1000000 // cl.c AS BIGINT) AS w_u
  FROM d JOIN cl ON d.h = cl.h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
       CAST(SUM(n_tokens * w_u) AS BIGINT) AS eff_tokens_u
FROM weighted GROUP BY source
"""


@register("q159_soft_dedup_weights", oracle=_Q159_ORACLE)
def q159_soft_dedup_weights(spark, sf_dir):
    from sparkextract.queries.base import checkpoint_memo

    def _build_d():
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        mirror = docs.filter(F.col("doc_id") % _Q159_EVERY == 0).select(
            (F.col("doc_id") + _Q159_ID_OFFSET).alias("doc_id"),
            F.lit("mirror").alias("source"),
            "text",
        )
        return docs.unionByName(mirror).select(
            "doc_id",
            "source",
            F.md5("text").alias("h"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )

    # the hashed corpus feeds BOTH join sides: materialize it once
    # (the q87/q125 memo discipline) instead of re-scanning the parquet
    # union per subtree
    d = checkpoint_memo(spark, sf_dir, "q159_d", _build_d)
    # cluster sizes: a mega-cluster is ONE row here, never a window key
    cl = d.groupBy("h").agg(F.count("*").cast("long").alias("c"))
    weighted = d.join(cl, "h").select(
        "source",
        "n_tokens",
        "c",
        F.expr("1000000 div c").cast("long").alias("w_u"),
    )
    return weighted.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.sum("n_tokens").cast("long").alias("raw_tokens"),
        F.sum(F.col("n_tokens") * F.col("w_u"))
        .cast("long")
        .alias("eff_tokens_u"),
    )


# --------------------------------------------------------------------------
# q160: per-source 2-token-prefix template profiling

_Q160_PREFIX_N = 2

_Q160_ORACLE = f"""
WITH d AS (
  SELECT source,
         array_to_string(string_split(text, ' ')[1:{_Q160_PREFIX_N}], ' ')
           AS prefix
  FROM documents
),
per_prefix AS (
  SELECT source, prefix, CAST(COUNT(*) AS BIGINT) AS c
  FROM d GROUP BY source, prefix
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_prefixes,
       CAST(MAX(c) AS BIGINT) AS max_prefix_docs,
       CAST(ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000.0
                  / SUM(c)) AS BIGINT) AS template_share_u
FROM per_prefix GROUP BY source
"""


@register("q160_template_prefix_profile", oracle=_Q160_ORACLE)
def q160_template_prefix_profile(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.array_join(
            F.slice(F.split("text", " "), 1, _Q160_PREFIX_N), " "
        ).alias("prefix"),
    )
    per_prefix = d.groupBy("source", "prefix").agg(
        F.count("*").cast("long").alias("c")
    )
    return per_prefix.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_prefixes"),
        F.max("c").cast("long").alias("max_prefix_docs"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            * F.lit(1000000.0)
            / F.sum("c")
        )
        .cast("long")
        .alias("template_share_u"),
    )
