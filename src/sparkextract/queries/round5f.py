"""Round-5 continuation wave 4: corpus-governance operators — integer
quota apportionment, chance-corrected detector agreement, link-graph
neighborhood quality propagation, and rank-correlation drift.

q150 — LARGEST-REMAINDER QUOTA APPORTIONMENT (Hamilton's method). A
mixture recipe (q90/q142) says each (lang, source) stratum gets weight
n_i/N of a fixed B-example budget; turning those weights into INTEGER
per-stratum quotas that sum EXACTLY to B is the apportionment problem,
and the standard answer is largest-remainder: base_i = floor(B*n_i/N),
then the R = B - sum(base_i) leftover seats go to the largest
remainders (ties broken by stratum key). Everything is BIGINT floor
arithmetic — base and remainder come from integer div/mod (positive
operands, so Spark `div` and DuckDB `//` agree), the remainder ranking
is a ROW_NUMBER over the <= (#langs x #sources) stratum grain (the
documented tiny-grain exception, cf. q137's 81-bin cumulative) — so
the result is bit-identical across engines with ZERO IEEE operations.
Scale shape: one map-side-combinable groupBy(lang, source) over the
corpus; everything after runs on the ~100-row stratum table.

q151 — DETECTOR AGREEMENT, CHANCE-CORRECTED (Cohen's kappa, 1960).
q144's Venn audit counts raw overlap between dedup methods; for
QUALITY GATES the curation literature reports kappa, which corrects
agreement for chance: with per-detector marginals a1/a0, b1/b0 over N
docs, kappa = (p_o - p_e) / (1 - p_e). Detector A is the q135 linear
classifier (logit_u >= 0), detector B the q130 unigram-entropy gate —
both already oracle-verified, both defined over the same >=1-token doc
set, so the join is a doc_id equi-join with no row loss. The 2x2
confusion reduces in ONE map-side-combinable aggregate (N, a1, b1,
n11; the other cells are derived), and kappa is computed from the
EXACT integer identity
    kappa = (N*(n00+n11) - E) / (N^2 - E),  E = a1*b1 + a0*b0
— one IEEE division at the end, snapped to micro-units. (N^2 * 1e6
must stay under 2^53: exact up to N ~ 9.5e4 per partitioned audit
grain; a full-corpus run at larger N reports kappa per md5 shard.)

q152 — NEIGHBORHOOD QUALITY PROPAGATION (1-hop message passing over
the q119 citation graph). Link-spam detection aggregates a per-node
score over in-neighbors: a page cited mostly by low-quality pages is
suspect ("TrustRank"-shape, Gyongyi et al. 2004, reduced to one
labeled-aggregation hop). Edges are q119's deterministic md5 citation
graph (3 out-edges per doc, self-loops dropped); the propagated label
is the q135 logit in exact integer micro-units, so the per-target SUM
is order-independent BIGINT arithmetic and only the mean is one
snapped IEEE division. The spam flag compares the INTEGER sum against
zero — no float in the decision.
Scale shape: edge generation is map-side (3 rows per doc, no shuffle);
the propagation is ONE groupBy(dst) with map-side partial sums — the
canonical message-passing dataflow (same shape as one q119 iteration).

q153 — RANK-CORRELATION DRIFT (Kendall tau-a between two quality
rankings). When a pipeline swaps quality filters, the question is not
"do the scores match" but "do they ORDER the corpus the same way" —
the standard scalar is Kendall's tau. All-pairs tau is O(N^2), so
production evals compute it on a deterministic sample (the q107
honest-sampled-eval protocol): docs with md5_bucket(doc_id, 29) == 0
form the sample, the pair grid is a broadcast self-join OF THE SAMPLE
ONLY, and concordant/discordant/tied counts are exact integers over
(q135 logit_u, q130 entropy) score pairs. tau_a = (C - D) / (n(n-1)/2)
is one snapped IEEE division. Ties in either score are counted and
excluded from both C and D (tau-a convention over a fixed denominator).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkextract.queries.base import (
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)
from sparkextract.queries.round5b import _cite_bucket_sql
from sparkextract.queries.round5c import _Q130_ORACLE, q130_token_entropy
from sparkextract.queries.round5d import _Q135_CORE_SQL, _q135_features

# --------------------------------------------------------------------------
# q150: largest-remainder quota apportionment

_Q150_BUDGET = 100_000

_Q150_ORACLE = f"""
WITH strata AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang, source
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM strata
), based AS (
  SELECT lang, source, n_docs,
         CAST(({_Q150_BUDGET} * n_docs) // t.n AS BIGINT) AS base_quota,
         CAST(({_Q150_BUDGET} * n_docs) % t.n AS BIGINT) AS rem
  FROM strata, tot t
), leftover AS (
  SELECT CAST({_Q150_BUDGET} - SUM(base_quota) AS BIGINT) AS r FROM based
), ranked AS (
  SELECT lang, source, n_docs, base_quota, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC, source ASC) AS rn
  FROM based
)
SELECT lang, source, n_docs, base_quota,
       (rn <= l.r) AS extra,
       CAST(base_quota + CASE WHEN rn <= l.r THEN 1 ELSE 0 END AS BIGINT)
         AS final_quota
FROM ranked, leftover l
"""


@register("q150_quota_apportionment", oracle=_Q150_ORACLE)
def q150_quota_apportionment(spark, sf_dir):
    strata = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = strata.agg(F.sum("n_docs").cast("long").alias("n"))
    based = strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        F.expr(f"({_Q150_BUDGET} * n_docs) div n").cast("long").alias(
            "base_quota"
        ),
        ((F.lit(_Q150_BUDGET) * F.col("n_docs")) % F.col("n"))
        .cast("long")
        .alias("rem"),
    )
    leftover = based.agg(
        (F.lit(_Q150_BUDGET) - F.sum("base_quota")).cast("long").alias("r")
    )
    # tiny grain: <= (#langs x #sources) rows — the documented exception
    # to the no-global-window rule
    w = Window.orderBy(F.desc("rem"), F.asc("lang"), F.asc("source"))
    ranked = based.withColumn("rn", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "lang",
        "source",
        "n_docs",
        "base_quota",
        (F.col("rn") <= F.col("r")).alias("extra"),
        (
            F.col("base_quota")
            + F.when(F.col("rn") <= F.col("r"), 1).otherwise(0)
        )
        .cast("long")
        .alias("final_quota"),
    )


# --------------------------------------------------------------------------
# q151: Cohen's kappa between the q135 and q130 quality gates

_Q151_ORACLE = f"""
WITH a AS (
  SELECT doc_id, (logit_u >= 0) AS ka FROM ({_Q135_CORE_SQL})
), b AS (
  SELECT doc_id, keep AS kb FROM ({_Q130_ORACLE})
), cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN ka THEN 1 ELSE 0 END) AS BIGINT) AS a1,
         CAST(SUM(CASE WHEN kb THEN 1 ELSE 0 END) AS BIGINT) AS b1,
         CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM a JOIN b USING (doc_id)
)
SELECT n, n11,
       CAST(a1 - n11 AS BIGINT) AS n10,
       CAST(b1 - n11 AS BIGINT) AS n01,
       CAST(n - a1 - b1 + n11 AS BIGINT) AS n00,
       CAST(ROUND((n - a1 - b1 + 2 * n11) * 1000000.0 / n) AS BIGINT)
         AS po_u,
       CAST(ROUND((a1 * b1 + (n - a1) * (n - b1)) * 1000000.0 / (n * n))
            AS BIGINT) AS pe_u,
       CAST(ROUND((n * (n - a1 - b1 + 2 * n11)
                   - (a1 * b1 + (n - a1) * (n - b1))) * 1000000.0
                  / (n * n - (a1 * b1 + (n - a1) * (n - b1))))
            AS BIGINT) AS kappa_u
FROM cells
"""


@register("q151_detector_kappa", oracle=_Q151_ORACLE)
def q151_detector_kappa(spark, sf_dir):
    a = _q135_features(spark, sf_dir).select(
        "doc_id", (F.col("logit_u") >= 0).alias("ka")
    )
    b = q130_token_entropy(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("kb")
    )
    cells = a.join(b, "doc_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("ka").cast("long")).cast("long").alias("a1"),
        F.sum(F.col("kb").cast("long")).cast("long").alias("b1"),
        F.sum((F.col("ka") & F.col("kb")).cast("long"))
        .cast("long")
        .alias("n11"),
    )
    n, a1, b1, n11 = (F.col(c) for c in ("n", "a1", "b1", "n11"))
    agree = n - a1 - b1 + 2 * n11           # n00 + n11, exact BIGINT
    e = a1 * b1 + (n - a1) * (n - b1)        # chance-agreement numerator

    def _ratio_u(num, den):
        return F.round(num * F.lit(1000000.0) / den).cast("long")

    return cells.select(
        "n",
        "n11",
        (a1 - n11).cast("long").alias("n10"),
        (b1 - n11).cast("long").alias("n01"),
        (n - a1 - b1 + n11).cast("long").alias("n00"),
        _ratio_u(agree, n).alias("po_u"),
        _ratio_u(e, n * n).alias("pe_u"),
        _ratio_u(n * agree - e, n * n - e).alias("kappa_u"),
    )


# --------------------------------------------------------------------------
# q152: 1-hop neighborhood quality propagation over the citation graph

_Q152_FANOUT = 3  # q119's graph: 3 md5 out-edges per doc


def _q152_oracle() -> str:
    edges_sel = " UNION ALL ".join(
        f"SELECT doc_id AS src, {_cite_bucket_sql(j)} AS dst"
        f" FROM documents, n"
        for j in range(_Q152_FANOUT)
    )
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
edges0 AS ({edges_sel}),
edges AS (SELECT src, dst FROM edges0 WHERE src <> dst),
lab AS (SELECT doc_id, logit_u FROM ({_Q135_CORE_SQL}))
SELECT e.dst AS node,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(l.logit_u) AS BIGINT) AS sum_src_logit_u,
       CAST(ROUND(SUM(l.logit_u) * 1.0 / COUNT(*)) AS BIGINT)
         AS mean_src_logit_u,
       (SUM(l.logit_u) < 0) AS low_quality_neighborhood
FROM edges e JOIN lab l ON l.doc_id = e.src
GROUP BY e.dst
"""


@register("q152_neighbor_quality", oracle=_q152_oracle())
def q152_neighbor_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.count()
    cite = [
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f"#{j}"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_docs
        ).alias("dst")
        for j in range(_Q152_FANOUT)
    ]
    edges = docs.select(
        F.col("doc_id").alias("src"), F.explode(F.array(*cite)).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    lab = _q135_features(spark, sf_dir).select(
        F.col("doc_id").alias("src"), "logit_u"
    )
    return (
        edges.join(lab, "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(
            F.count("*").cast("long").alias("n_in"),
            F.sum("logit_u").cast("long").alias("sum_src_logit_u"),
        )
        .select(
            "node",
            "n_in",
            "sum_src_logit_u",
            F.round(F.col("sum_src_logit_u") * F.lit(1.0) / F.col("n_in"))
            .cast("long")
            .alias("mean_src_logit_u"),
            (F.col("sum_src_logit_u") < 0).alias("low_quality_neighborhood"),
        )
    )


# --------------------------------------------------------------------------
# q153: Kendall tau-a rank agreement on a deterministic sample

_Q153_SAMPLE_BUCKETS = 29

_Q153_ORACLE = f"""
WITH scored AS (
  SELECT c.doc_id, c.logit_u,
         CAST(ROUND(b.entropy * 1000000.0) AS BIGINT) AS entropy_u
  FROM ({_Q135_CORE_SQL}) c
  JOIN ({_Q130_ORACLE}) b USING (doc_id)
  WHERE {md5_bucket_sql("c.doc_id", _Q153_SAMPLE_BUCKETS)} = 0
), pairs AS (
  SELECT CASE WHEN (a.logit_u - b.logit_u) * (a.entropy_u - b.entropy_u) > 0
              THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.logit_u - b.logit_u) * (a.entropy_u - b.entropy_u) < 0
              THEN 1 ELSE 0 END AS disc
  FROM scored a JOIN scored b ON a.doc_id < b.doc_id
), agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_sample,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(conc) AS BIGINT) AS concordant,
         CAST(SUM(disc) AS BIGINT) AS discordant
  FROM pairs
)
SELECT n_sample, n_pairs, concordant, discordant,
       CAST(n_pairs - concordant - discordant AS BIGINT) AS ties,
       CAST(ROUND((concordant - discordant) * 1000000.0 / n_pairs)
            AS BIGINT) AS tau_u
FROM agg
"""


@register("q153_rank_agreement", oracle=_Q153_ORACLE)
def q153_rank_agreement(spark, sf_dir):
    logit = _q135_features(spark, sf_dir).select("doc_id", "logit_u")
    ent = q130_token_entropy(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("entropy") * F.lit(1000000.0)).cast("long").alias(
            "entropy_u"
        ),
    )
    scored = (
        logit.join(ent, "doc_id")
        .filter(md5_bucket(F.col("doc_id"), _Q153_SAMPLE_BUCKETS) == 0)
    )
    a = scored.select(
        F.col("doc_id").alias("ida"),
        F.col("logit_u").alias("la"),
        F.col("entropy_u").alias("ea"),
    )
    b = scored.select(
        F.col("doc_id").alias("idb"),
        F.col("logit_u").alias("lb"),
        F.col("entropy_u").alias("eb"),
    )
    prod = (F.col("la") - F.col("lb")) * (F.col("ea") - F.col("eb"))
    # the pair grid is sample x sample only (q107's honest protocol):
    # broadcast the bounded sample, never the corpus
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.when(prod > 0, 1).otherwise(0).alias("conc"),
            F.when(prod < 0, 1).otherwise(0).alias("disc"),
        )
    )
    n_sample = scored.agg(F.count("*").cast("long").alias("n_sample"))
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
    )
    return agg.crossJoin(F.broadcast(n_sample)).select(
        "n_sample",
        "n_pairs",
        "concordant",
        "discordant",
        (F.col("n_pairs") - F.col("concordant") - F.col("discordant"))
        .cast("long")
        .alias("ties"),
        F.round(
            (F.col("concordant") - F.col("discordant"))
            * F.lit(1000000.0)
            / F.col("n_pairs")
        )
        .cast("long")
        .alias("tau_u"),
    )
