"""Round-5 continuation wave 12: LSH parameter tuning + incremental
view maintenance.

q169 — MINHASH LSH S-CURVE SWEEP. Choosing the band/row layout (b x r)
is THE tuning decision of corpus-scale MinHash dedup: the candidate
probability is 1-(1-s^r)^b, so more bands catch lower-similarity pairs
(recall) at the cost of junk candidates (precision). The sweep makes
that executable from ONE 16-permutation signature table: four layouts
(16x1, 8x2, 4x4, 2x8) are banded from the same signatures, each
layout's banded self-join yields its candidate set, and candidates
are exact-verified with 8-char-shingle Jaccard >= 0.5 (the integer
form 2*|A&B| >= |A|+|B|-|A&B|, exact in both engines). The verdict
per layout: candidate count, verified-true count, precision. Scale
shape: a parameter sweep NEVER runs at corpus scale — the aggressive
16x1 layout's junk-candidate set grows superlinearly by design (that
is what the sweep measures), so the sweep corpus is a bounded
deterministic md5-bucket sample (the q107 sampled-eval protocol) with
the planted near-dup twins derived FROM the sample so every true pair
stays inside it; the winning layout is what then runs corpus-wide
(q38/q118). Within the sample: signatures are one map-side-combinable
16-min aggregate built ONCE (checkpoint_memo) and reused by all four
layouts; every join is a banded-key equi-join — never all-pairs; the
exact verify runs only on candidates.

q170 — INCREMENTAL GROUPED-VIEW MAINTENANCE (dirty-group recompute).
A per-source stats view over 10^12 docs cannot be recomputed per
snapshot. The algebraic path: classify the snapshot delta
(added/changed/deleted via one doc_id full-outer join — q103's rule
extended with deletions), delta-apply the mergeable stats
(count/sum), and recompute the NON-mergeable ones (min/max) only for
DIRTY groups (sources touched by the delta) — clean groups carry
their old values untouched. The verdict compares the maintained view
to a from-scratch recompute per source (`matches_full`), proving the
maintenance algebra. All stats are integer char-lengths — exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import (
    checkpoint_memo,
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

_Q169_NPERM = 16
_Q169_CONFIGS = [(16, 1), (8, 2), (4, 4), (2, 8)]
_Q169_SAMPLE_BUCKETS = 4  # sweep runs on the bucket-0 quarter of the corpus

_Q169_CORPUS = f"""
  WITH sampled AS (
    SELECT doc_id, text FROM documents
    WHERE {md5_bucket_sql("doc_id", _Q169_SAMPLE_BUCKETS)} = 0
  )
  SELECT doc_id, SUBSTRING(text, 1, 256) AS head FROM sampled
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         SUBSTRING('xxxxxxxxxx' || SUBSTRING(text, 11), 1, 256) AS head
  FROM sampled WHERE doc_id % 11 = 0
"""

_Q169_SHINGLES_SQL = (
    "list_distinct(list_transform(range(1, GREATEST(LENGTH(head) - 7, 1) + 1), "
    "i -> SUBSTRING(head, i, 8)))"
)


def _q169_oracle() -> str:
    mins = ", ".join(
        f"list_min(list_transform(sset, s -> md5('p{j}|' || s))) AS h{j}"
        for j in range(_Q169_NPERM)
    )
    branches = []
    for b, r in _Q169_CONFIGS:
        cfg = f"{b}x{r}"
        for band in range(b):
            key = " || '|' || ".join(f"h{band * r + j}" for j in range(r))
            branches.append(
                f"SELECT doc_id, '{cfg}' AS cfg, "
                f"md5('cfg|{cfg}|{band}|' || {key}) AS bkey FROM sigs"
            )
    buckets = "\n  UNION ALL\n  ".join(branches)
    meta = " UNION ALL ".join(
        f"SELECT '{b}x{r}' AS cfg, CAST({b} AS BIGINT) AS n_bands, "
        f"CAST({r} AS BIGINT) AS rows_per_band"
        for b, r in _Q169_CONFIGS
    )
    return f"""
WITH corpus AS (
  {_Q169_CORPUS}
),
shing AS (
  SELECT doc_id, {_Q169_SHINGLES_SQL} AS sset FROM corpus
),
sigs AS (
  SELECT doc_id, sset, {mins} FROM shing
),
buckets AS (
  {buckets}
),
pairs AS (
  SELECT DISTINCT x.cfg, x.doc_id AS l, y.doc_id AS r
  FROM buckets x JOIN buckets y
    ON x.cfg = y.cfg AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
verified AS (
  SELECT p.cfg,
         (2 * LENGTH(list_intersect(a.sset, b.sset))
          >= LENGTH(a.sset) + LENGTH(b.sset)
             - LENGTH(list_intersect(a.sset, b.sset))) AS is_true
  FROM pairs p
  JOIN sigs a ON a.doc_id = p.l
  JOIN sigs b ON b.doc_id = p.r
),
agg AS (
  SELECT cfg, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs
  FROM verified GROUP BY cfg
),
meta AS ({meta})
SELECT m.cfg AS config, m.n_bands, m.rows_per_band,
       COALESCE(a.n_candidates, 0) AS n_candidates,
       COALESCE(a.n_true_pairs, 0) AS n_true_pairs,
       CASE WHEN COALESCE(a.n_candidates, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(ROUND(a.n_true_pairs * 1000000.0 / a.n_candidates)
                      AS BIGINT) END AS precision_u
FROM meta m LEFT JOIN agg a ON a.cfg = m.cfg
"""


def _q169_sigs(spark, sf_dir):
    def build():
        docs = (
            load(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .where(md5_bucket(F.col("doc_id"), _Q169_SAMPLE_BUCKETS) == 0)
        )
        near = docs.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.lit("xxxxxxxxxx"), F.expr("substring(text, 11)")).alias(
                "text"
            ),
        )
        corpus = docs.unionByName(near).select(
            "doc_id", F.substring("text", 1, 256).alias("head")
        )
        sset = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("head") - 7, F.lit(1))),
                lambda i: F.col("head").substr(i, F.lit(8)),
            )
        )
        shing = corpus.select("doc_id", sset.alias("sset"))
        def salted_md5(salt):
            # NB: must be a ONE-arg lambda — F.transform treats a
            # two-parameter lambda as (element, index)
            return lambda s: F.md5(F.concat(F.lit(salt), s))

        mins = [
            F.array_min(F.transform("sset", salted_md5(f"p{j}|"))).alias(f"h{j}")
            for j in range(_Q169_NPERM)
        ]
        return shing.select("doc_id", "sset", *mins)

    return checkpoint_memo(spark, sf_dir, "q169_sigs", build)


@register("q169_lsh_s_curve_sweep", oracle=_q169_oracle())
def q169_lsh_s_curve_sweep(spark, sf_dir):
    sigs = _q169_sigs(spark, sf_dir)
    bucket_structs = []
    for b, r in _Q169_CONFIGS:
        cfg = f"{b}x{r}"
        for band in range(b):
            key_cols = [F.col(f"h{band * r + j}") for j in range(r)]
            parts: list = [F.lit(f"cfg|{cfg}|{band}|")]
            for j, kc in enumerate(key_cols):
                if j:
                    parts.append(F.lit("|"))
                parts.append(kc)
            bucket_structs.append(
                F.struct(F.lit(cfg).alias("cfg"), F.md5(F.concat(*parts)).alias("bkey"))
            )
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*bucket_structs)).alias("e")
    ).select("doc_id", "e.cfg", "e.bkey")
    x = buckets.alias("x")
    y = buckets.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.cfg") == F.col("y.cfg"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.cfg").alias("cfg"),
            F.col("x.doc_id").alias("l"),
            F.col("y.doc_id").alias("r"),
        )
        .distinct()
    )
    ssets = sigs.select("doc_id", "sset")
    a = ssets.select(F.col("doc_id").alias("l"), F.col("sset").alias("sa"))
    bb = ssets.select(F.col("doc_id").alias("r"), F.col("sset").alias("sb"))
    n_int = F.size(F.array_intersect("sa", "sb"))
    verified = (
        pairs.join(a, "l")
        .join(bb, "r")
        .select(
            "cfg",
            (2 * n_int >= F.size("sa") + F.size("sb") - n_int).alias("is_true"),
        )
    )
    agg = verified.groupBy("cfg").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("is_true"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_pairs"),
    )
    meta = spark.createDataFrame(
        [(f"{b}x{r}", b, r) for b, r in _Q169_CONFIGS],
        "cfg string, n_bands long, rows_per_band long",
    )
    return meta.join(agg, "cfg", "left").select(
        F.col("cfg").alias("config"),
        "n_bands",
        "rows_per_band",
        F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce("n_true_pairs", F.lit(0)).cast("long").alias("n_true_pairs"),
        F.when(F.coalesce("n_candidates", F.lit(0)) == 0, F.lit(0))
        .otherwise(
            F.round(F.col("n_true_pairs") * F.lit(1000000.0) / F.col("n_candidates"))
        )
        .cast("long")
        .alias("precision_u"),
    )


# --------------------------------------------------------------------------
_Q170_BUCKETS = 10  # q103's rule: bucket 0 added, bucket 1 changed
_Q170_GHOST_BUCKET = 2  # bucket-2 docs ALSO existed as ghosts, now deleted

# old snapshot: bucket-0 docs missing (-> added in new), bucket-1 docs
# carried 'stale ' prefixed text (-> changed), and every bucket-2 doc
# had a ghost sibling (doc_id + 3000000, same source) that the new
# snapshot dropped (-> deleted).
_Q170_OLD = f"""
  SELECT doc_id,
         CASE WHEN {md5_bucket_sql("doc_id", _Q170_BUCKETS)} = 1
              THEN 'stale ' || text ELSE text END AS text,
         source
  FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q170_BUCKETS)} <> 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, 'ghost ' || text AS text, source
  FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q170_BUCKETS)} = {_Q170_GHOST_BUCKET}
"""

_Q170_ORACLE = f"""
WITH old AS (
  {_Q170_OLD}
),
old_view AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
         CAST(MIN(LENGTH(text)) AS BIGINT) AS min_chars,
         CAST(MAX(LENGTH(text)) AS BIGINT) AS max_chars
  FROM old GROUP BY source
),
delta AS (
  SELECT COALESCE(n.source, o.source) AS source,
         CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END
         - CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END AS d_n,
         COALESCE(LENGTH(n.text), 0) - COALESCE(LENGTH(o.text), 0) AS d_sum
  FROM documents n
  FULL OUTER JOIN old o ON o.doc_id = n.doc_id
  WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
),
dirty AS (
  SELECT source, CAST(SUM(d_n) AS BIGINT) AS d_n,
         CAST(SUM(d_sum) AS BIGINT) AS d_sum
  FROM delta GROUP BY source
),
dirty_minmax AS (
  SELECT n.source, CAST(MIN(LENGTH(n.text)) AS BIGINT) AS min_chars,
         CAST(MAX(LENGTH(n.text)) AS BIGINT) AS max_chars
  FROM documents n WHERE n.source IN (SELECT source FROM dirty)
  GROUP BY n.source
),
maintained AS (
  SELECT COALESCE(ov.source, d.source) AS source,
         (d.source IS NOT NULL) AS dirty,
         COALESCE(ov.n_docs, 0) + COALESCE(d.d_n, 0) AS n_docs,
         COALESCE(ov.sum_chars, 0) + COALESCE(d.d_sum, 0) AS sum_chars,
         CASE WHEN d.source IS NULL THEN ov.min_chars ELSE dm.min_chars END
           AS min_chars,
         CASE WHEN d.source IS NULL THEN ov.max_chars ELSE dm.max_chars END
           AS max_chars
  FROM old_view ov
  FULL OUTER JOIN dirty d ON d.source = ov.source
  LEFT JOIN dirty_minmax dm ON dm.source = d.source
),
full_view AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
         CAST(MIN(LENGTH(text)) AS BIGINT) AS min_chars,
         CAST(MAX(LENGTH(text)) AS BIGINT) AS max_chars
  FROM documents GROUP BY source
)
SELECT m.source, m.dirty,
       CAST(m.n_docs AS BIGINT) AS n_docs,
       CAST(m.sum_chars AS BIGINT) AS sum_chars,
       m.min_chars, m.max_chars,
       (m.n_docs = f.n_docs AND m.sum_chars = f.sum_chars
        AND m.min_chars = f.min_chars AND m.max_chars = f.max_chars)
         AS matches_full
FROM maintained m JOIN full_view f ON f.source = m.source
"""


@register("q170_incremental_view_maintenance", oracle=_Q170_ORACLE)
def q170_incremental_view_maintenance(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    bkt = md5_bucket(F.col("doc_id"), _Q170_BUCKETS)
    old = (
        docs.where(bkt != 0)
        .select(
            "doc_id",
            F.when(bkt == 1, F.concat(F.lit("stale "), F.col("text")))
            .otherwise(F.col("text"))
            .alias("text"),
            "source",
        )
        .unionByName(
            docs.where(bkt == _Q170_GHOST_BUCKET).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(F.lit("ghost "), F.col("text")).alias("text"),
                "source",
            )
        )
    )

    def view_of(df):
        return df.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.min(F.length("text")).cast("long").alias("min_chars"),
            F.max(F.length("text")).cast("long").alias("max_chars"),
        )

    old_view = view_of(old)
    full_view = view_of(docs)
    n = docs.alias("n")
    o = old.alias("o")
    delta = (
        n.join(o, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
        .where(
            F.col("o.doc_id").isNull()
            | F.col("n.doc_id").isNull()
            | (F.col("o.text") != F.col("n.text"))
        )
        .select(
            F.coalesce("n.source", "o.source").alias("source"),
            (
                F.when(F.col("o.doc_id").isNull(), 1).otherwise(0)
                - F.when(F.col("n.doc_id").isNull(), 1).otherwise(0)
            ).alias("d_n"),
            (
                F.coalesce(F.length("n.text"), F.lit(0))
                - F.coalesce(F.length("o.text"), F.lit(0))
            ).alias("d_sum"),
        )
    )
    dirty = delta.groupBy("source").agg(
        F.sum("d_n").cast("long").alias("d_n"),
        F.sum("d_sum").cast("long").alias("d_sum"),
    )
    # min/max are not delta-maintainable: recompute ONLY dirty groups
    # (a broadcast semi-join keeps the clean majority untouched)
    dirty_minmax = (
        docs.join(F.broadcast(dirty.select("source")), "source", "semi")
        .groupBy("source")
        .agg(
            F.min(F.length("text")).cast("long").alias("dm_min"),
            F.max(F.length("text")).cast("long").alias("dm_max"),
        )
    )
    maintained = (
        old_view.alias("ov")
        .join(F.broadcast(dirty.alias("d")), "source", "full_outer")
        .join(F.broadcast(dirty_minmax.alias("dm")), "source", "left")
        .select(
            "source",
            F.col("d.d_n").isNotNull().alias("dirty"),
            (F.coalesce("ov.n_docs", F.lit(0)) + F.coalesce("d.d_n", F.lit(0)))
            .cast("long")
            .alias("n_docs"),
            (
                F.coalesce("ov.sum_chars", F.lit(0))
                + F.coalesce("d.d_sum", F.lit(0))
            )
            .cast("long")
            .alias("sum_chars"),
            F.when(F.col("d.d_n").isNull(), F.col("ov.min_chars"))
            .otherwise(F.col("dm.dm_min"))
            .alias("min_chars"),
            F.when(F.col("d.d_n").isNull(), F.col("ov.max_chars"))
            .otherwise(F.col("dm.dm_max"))
            .alias("max_chars"),
        )
    )
    f = full_view.select(
        F.col("source").alias("f_source"),
        F.col("n_docs").alias("f_n"),
        F.col("sum_chars").alias("f_sum"),
        F.col("min_chars").alias("f_min"),
        F.col("max_chars").alias("f_max"),
    )
    return maintained.join(
        f, maintained["source"] == f["f_source"]
    ).select(
        "source",
        "dirty",
        "n_docs",
        "sum_chars",
        "min_chars",
        "max_chars",
        (
            (F.col("n_docs") == F.col("f_n"))
            & (F.col("sum_chars") == F.col("f_sum"))
            & (F.col("min_chars") == F.col("f_min"))
            & (F.col("max_chars") == F.col("f_max"))
        ).alias("matches_full"),
    )
