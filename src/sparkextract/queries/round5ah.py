"""Round-5 continuation wave 32: paraphrase-robust decontamination and
dedup return-on-investment.

q210 — FUZZY (MINHASH-BANDED) DECONTAMINATION. q91/q104/q198 catch
VERBATIM eval contamination via exact 13-gram keys; a paraphrased or
lightly-edited leak defeats all three (replace one token out of every
ten and NO 13-token window survives intact — every window spans at
least one edit). This query is the fuzzy tier the published
decontamination stacks add on top (e.g. token-overlap thresholds over
shingled minhash): documents are shingled into token TRIGRAMS, 4
banded min-hash signatures per doc are band-equality joined between
the corpus and the eval slice, and candidates are verified with exact
trigram-set Jaccard >= 0.5 in integer micro-units. The corpus carries
injected PERTURBED eval copies (doc_id + 5,000,000, every 10th token
replaced) — the pytest proves each one shares ZERO exact 13-grams
with its source (exact-tier blind) yet is caught here; the output's
exact_contaminated column carries the same proof per pair through
the oracle.

Scale shape: signature build is shingle-explode -> per-band mergeable
MIN (map-side combinable); candidate generation is an equi-join on
the (band, sig) key against the tiny broadcast eval signature table;
the trigram-set verify join touches candidate pairs only. No
corpus-sized self-join, no windows.

q211 — DEDUP ROI CURVE. The decision-support rollup a dedup run ends
with: rank exact-duplicate clusters by REMOVABLE mass ((size-1) *
doc chars) and report the cumulative fraction of the corpus that
removing the top-k clusters reclaims. The q13 injected-duplicate
corpus (verbatim copies of every 13th doc at doc_id + 1,000,000)
guarantees non-trivial clusters. Exact integers end to end; the
cumulative window runs over the top-20 cluster grain after a
TakeOrderedAndProject-shaped rank.

Scale shape: groupBy(content hash) mergeable size/mass rollup, rank
by removable mass (top-k, distributed partial sort), prefix sum over
20 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, md5_bucket, md5_bucket_sql, register

# ---------------------------------------------------------------------
# q210
_Q210_EVAL_BUCKETS = 20  # eval slice: md5 bucket 0 (q91 convention)
_Q210_BANDS = 4
_Q210_PERTURB_EVERY = 10
_Q210_MIN_JAC_U = 500_000
_Q210_EXACT_K = 13  # the exact tier's k-gram width (q91)

# words / perturbed words / trigram shingles, DuckDB side
_Q210_W = "list_filter(string_split(text, ' '), t -> t <> '')"


def _q210_perturb_sql(w: str) -> str:
    return (
        f"list_transform(range(1, len({w}) + 1), "
        f"i -> CASE WHEN i % {_Q210_PERTURB_EVERY} = 0 THEN 'zz' "
        f"ELSE {w}[i] END)"
    )


def _q210_tri_sql(w: str) -> str:
    return (
        f"list_transform(range(1, GREATEST(len({w}) - 2, 0) + 1), "
        f"i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2])"
    )


def _q210_k_sql(w: str, k: int) -> str:
    return (
        f"list_transform(range(1, GREATEST(len({w}) - {k} + 1, 0) + 1), "
        f"i -> array_to_string({w}[i:i+{k - 1}], ' '))"
    )


_Q210_SIGS = ", ".join(
    f"list_min(list_transform(tri, s -> md5('f{b}|' || s))) AS sig{b}"
    for b in range(_Q210_BANDS)
)

_Q210_ORACLE = f"""
WITH ev AS (
  SELECT doc_id, {_Q210_W} AS w FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q210_EVAL_BUCKETS)} = 0
),
corpus AS (
  SELECT doc_id, {_Q210_W} AS w FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q210_EVAL_BUCKETS)} <> 0
  UNION ALL
  SELECT doc_id + 5000000 AS doc_id, {_q210_perturb_sql("w")} AS w
  FROM ev
),
esig AS (
  SELECT doc_id, {_Q210_SIGS}
  FROM (SELECT doc_id, {_q210_tri_sql("w")} AS tri FROM ev WHERE len(w) >= 3)
),
csig AS (
  SELECT doc_id, {_Q210_SIGS}
  FROM (SELECT doc_id, {_q210_tri_sql("w")} AS tri FROM corpus WHERE len(w) >= 3)
),
eb AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, unnest([{", ".join(f"sig{b}" for b in range(_Q210_BANDS))}]) AS sig,
           unnest([{", ".join(str(b) for b in range(_Q210_BANDS))}]) AS band
    FROM esig)
),
cb AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, unnest([{", ".join(f"sig{b}" for b in range(_Q210_BANDS))}]) AS sig,
           unnest([{", ".join(str(b) for b in range(_Q210_BANDS))}]) AS band
    FROM csig)
),
cand AS (
  SELECT DISTINCT c.doc_id AS corpus_id, e.doc_id AS eval_id
  FROM cb c JOIN eb e ON c.band = e.band AND c.sig = e.sig
),
tri_sets AS (
  SELECT doc_id, list_distinct({_q210_tri_sql("w")}) AS ts, w FROM corpus
  UNION ALL
  SELECT doc_id, list_distinct({_q210_tri_sql("w")}) AS ts, w FROM ev
),
scored AS (
  SELECT p.corpus_id, p.eval_id,
         CAST((1000000 * len(list_intersect(a.ts, b.ts)))
              // len(list_distinct(list_concat(a.ts, b.ts))) AS BIGINT) AS jac_u,
         len(list_intersect(
           list_distinct({_q210_k_sql("a.w", _Q210_EXACT_K)}),
           list_distinct({_q210_k_sql("b.w", _Q210_EXACT_K)}))) > 0
           AS exact_contaminated
  FROM cand p
  JOIN tri_sets a ON a.doc_id = p.corpus_id
  JOIN tri_sets b ON b.doc_id = p.eval_id
)
SELECT corpus_id, eval_id, jac_u, exact_contaminated
FROM scored
WHERE jac_u >= {_Q210_MIN_JAC_U}
"""


def _q210_words(col="text"):
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def _q210_perturb(w):
    return F.transform(
        F.sequence(F.lit(1), F.size(w)),
        lambda i: F.when(i % _Q210_PERTURB_EVERY == 0, F.lit("zz")).otherwise(
            F.element_at(w, i)
        ),
    )


def _q210_tri(w):
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) — guard short docs with
    # an explicit empty array instead of a 0-length upper bound
    return F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _q210_kgrams(w, k: int):
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - k + 1),
            lambda i: F.array_join(F.slice(w, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _q210_sig_cols(tri):
    return [
        F.array_min(
            F.transform(tri, lambda s: F.md5(F.concat(F.lit(f"f{b}|"), s)))
        ).alias(f"sig{b}")
        for b in range(_Q210_BANDS)
    ]


def _q210_bands(sig_df):
    return sig_df.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"sig{b}") for b in range(_Q210_BANDS)])).alias(
            "band", "sig"
        ),
    )


def _q210_feat(df):
    """One pass per side: (doc_id, band sigs, trigram set, k-gram set).
    Everything downstream (signature bands, the Jaccard verify, the
    exact-tier proof) reads THIS frame, so each side costs exactly one
    corpus scan (the un-memoized form showed 9 scans in PLANS.md)."""
    tri = _q210_tri(F.col("w"))
    return df.select(
        "doc_id",
        *_q210_sig_cols(tri),
        F.array_distinct(tri).alias("ts"),
        F.array_distinct(_q210_kgrams(F.col("w"), _Q210_EXACT_K)).alias("ks"),
    )


@register("q210_fuzzy_decontamination", oracle=_Q210_ORACLE)
def q210_fuzzy_decontamination(spark, sf_dir):
    from sparkextract.queries.base import checkpoint_memo

    def build(side):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        is_eval = md5_bucket(F.col("doc_id"), _Q210_EVAL_BUCKETS) == 0
        ev = docs.filter(is_eval).select("doc_id", _q210_words().alias("w"))
        if side == "ev":
            return _q210_feat(ev)
        corpus = (
            docs.filter(~is_eval)
            .select("doc_id", _q210_words().alias("w"))
            .unionByName(
                ev.select(
                    (F.col("doc_id") + 5000000).alias("doc_id"),
                    _q210_perturb(F.col("w")).alias("w"),
                )
            )
        )
        return _q210_feat(corpus)

    ev_feat = checkpoint_memo(spark, sf_dir, "q210_ev", lambda: build("ev"))
    corpus_feat = checkpoint_memo(
        spark, sf_dir, "q210_corpus", lambda: build("corpus")
    )
    has_sig = F.size("ts") > 0
    eb = _q210_bands(ev_feat.filter(has_sig)).select(
        F.col("doc_id").alias("eval_id"), "band", "sig"
    )
    cb = _q210_bands(corpus_feat.filter(has_sig)).select(
        F.col("doc_id").alias("corpus_id"), "band", "sig"
    )
    cand = cb.join(F.broadcast(eb), ["band", "sig"]).select(
        "corpus_id", "eval_id"
    ).distinct()
    a = corpus_feat.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("ts").alias("ts_a"),
        F.col("ks").alias("ks_a"),
    )
    b = ev_feat.select(
        F.col("doc_id").alias("eval_id"),
        F.col("ts").alias("ts_b"),
        F.col("ks").alias("ks_b"),
    )
    jac = F.expr(
        "(1000000 * size(array_intersect(ts_a, ts_b)))"
        " div size(array_distinct(concat(ts_a, ts_b)))"
    )
    return (
        cand.join(a, "corpus_id")
        .join(b, "eval_id")
        .select(
            "corpus_id",
            "eval_id",
            jac.cast("long").alias("jac_u"),
            (F.size(F.array_intersect("ks_a", "ks_b")) > 0).alias(
                "exact_contaminated"
            ),
        )
        .filter(F.col("jac_u") >= _Q210_MIN_JAC_U)
    )


# ---------------------------------------------------------------------
# q211
_Q211_TOPK = 20

_Q211_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
),
clusters AS (
  SELECT md5(text) AS ckey,
         CAST(COUNT(*) AS BIGINT) AS cluster_size,
         CAST(LENGTH(MIN(text)) AS BIGINT) AS doc_chars,
         CAST((COUNT(*) - 1) * LENGTH(MIN(text)) AS BIGINT) AS removable_chars
  FROM corpus GROUP BY md5(text)
),
tot AS (SELECT CAST(SUM(cluster_size * doc_chars) AS BIGINT) AS total_chars
        FROM clusters),
ranked AS (
  SELECT ckey, cluster_size, doc_chars, removable_chars,
         ROW_NUMBER() OVER (ORDER BY removable_chars DESC, ckey ASC) AS rk
  FROM clusters
)
SELECT CAST(r.rk AS BIGINT) AS rank, r.ckey, r.cluster_size,
       r.removable_chars,
       CAST(SUM(r.removable_chars) OVER (ORDER BY r.rk) AS BIGINT)
         AS cum_removable,
       t.total_chars,
       CAST((1000000 * SUM(r.removable_chars) OVER (ORDER BY r.rk))
            // t.total_chars AS BIGINT) AS cum_saved_frac_u
FROM ranked r CROSS JOIN tot t
WHERE r.rk <= {_Q211_TOPK}
ORDER BY r.rk
"""


@register("q211_dedup_roi_curve", oracle=_Q211_ORACLE)
def q211_dedup_roi_curve(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    clusters = corpus.groupBy(F.md5("text").alias("ckey")).agg(
        F.count("*").cast("long").alias("cluster_size"),
        F.length(F.min("text")).cast("long").alias("doc_chars"),
        ((F.count("*") - 1) * F.length(F.min("text")))
        .cast("long")
        .alias("removable_chars"),
    )
    tot = clusters.agg(
        F.sum(F.col("cluster_size") * F.col("doc_chars"))
        .cast("long")
        .alias("total_chars")
    )
    # top-k FIRST via orderBy().limit() — TakeOrderedAndProject, the
    # distributed partial sort — then the rank window runs over 20 rows
    # (a global row_number over the full cluster grain would funnel the
    # whole cluster table through one task)
    top = clusters.orderBy(F.desc("removable_chars"), F.asc("ckey")).limit(_Q211_TOPK)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("removable_chars"), F.asc("ckey"))),
    )
    wcum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "ckey",
            "cluster_size",
            "removable_chars",
            F.sum("removable_chars").over(wcum).cast("long").alias("cum_removable"),
            "total_chars",
            F.expr(
                "(1000000 * sum(removable_chars) over"
                " (order by rank rows between unbounded preceding and current row))"
                " div total_chars"
            )
            .cast("long")
            .alias("cum_saved_frac_u"),
        )
        .orderBy("rank")
    )
