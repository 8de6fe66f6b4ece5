"""Round-5 continuation wave 33: index- and file-layout economics —
the exact arithmetic behind two storage decisions every 100 TB corpus
store makes.

q212 — POSTING-LIST ENCODING ADVISOR (Elias-Fano vs bitmap vs
delta-varint; Vigna 2013 "Quasi-succinct indices"). For the 20
highest-df tokens: the EXACT size in bits of each candidate encoding
of the token's sorted posting list. Elias-Fano: n*(2 + l) bits with
l = max(0, floor(log2(u/n))); bitmap: u bits; delta-varint: sum over
gaps g of 8 * ceil(bitlen(g)/7). floor-log2 and bit lengths are
computed INTEGER-EXACTLY via length(bin(x)) - 1 (both engines print
identical binary strings — no float log2 anywhere, so no
power-of-two boundary rounding risk). The winner column is the
advisory.
Reference intent: the reference's pgvector/keyword store
(/root/reference/src/rag/vector_database.py) persists posting
structures; at corpus scale the encoding is chosen per list from
exactly these numbers.

Scale shape: (token, doc) grain mergeable aggs; the gap computation
is a LAG window PARTITIONED BY token (parallel across the
vocabulary); top-20 via TakeOrderedAndProject.

q213 — ZONE-MAP PRUNING AUDIT: LINEAR vs Z-ORDER (Morton) LAYOUT —
the exact experiment behind Iceberg/Delta Z-ORDER clustering. Both
layouts place the corpus into 64 zones; zone maps keep per-zone
min/max of the two filter dimensions (n_chars; an md5-derived second
key standing in for an independent column). A 2-D box predicate then
prunes every zone whose [min,max] envelope misses the box. Linear
layout (zones = doc_id ranges) gives random envelopes on BOTH
dimensions — almost nothing prunes; the Morton layout (4+4-bit
interleave of the quantized dimensions — bit arithmetic, identical
in both engines) keeps both envelopes tight — most zones prune. The
output is the per-layout ledger: zones pruned, rows scanned, rows
matched, scan amplification in micro-units.

Scale shape: zone assignment is pure map-side integer arithmetic
(the corpus min/max for the linear ranges is a 1-row broadcast);
zone maps are a 64-group mergeable agg; the verdict operates on 128
rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, md5_bucket_sql, register

# ---------------------------------------------------------------------
# q212
_Q212_TOPK = 20

_Q212_ORACLE = f"""
WITH posting AS (
  SELECT t, doc_id FROM (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
    FROM documents)
),
u AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS u FROM documents),
gaps AS (
  SELECT t, doc_id,
         doc_id - LAG(doc_id) OVER (PARTITION BY t ORDER BY doc_id) AS g
  FROM posting
),
per_tok AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(CASE WHEN g IS NULL THEN LENGTH(bin(doc_id + 1))
                       ELSE LENGTH(bin(g)) END) AS BIGINT) AS gap_bitlen_sum,
         CAST(SUM(CASE WHEN g IS NULL
                       THEN 8 * ((LENGTH(bin(doc_id + 1)) + 6) // 7)
                       ELSE 8 * ((LENGTH(bin(g)) + 6) // 7) END) AS BIGINT)
           AS varint_bits
  FROM gaps GROUP BY t
),
sized AS (
  SELECT p.t, p.df, u.u,
         CAST(p.df * (2 + GREATEST(LENGTH(bin(u.u // p.df)) - 1, 0))
              AS BIGINT) AS ef_bits,
         u.u AS bitmap_bits,
         p.varint_bits
  FROM per_tok p CROSS JOIN u
)
SELECT t AS token, df, u AS universe, ef_bits, bitmap_bits, varint_bits,
       CASE WHEN ef_bits <= bitmap_bits AND ef_bits <= varint_bits
              THEN 'elias_fano'
            WHEN bitmap_bits <= varint_bits THEN 'bitmap'
            ELSE 'varint' END AS best_encoding
FROM sized
ORDER BY df DESC, token ASC
LIMIT {_Q212_TOPK}
"""


@register("q212_posting_encoding_advisor", oracle=_Q212_ORACLE)
def q212_posting_encoding_advisor(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    posting = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    u = docs.agg((F.max("doc_id") + 1).cast("long").alias("u"))
    wlag = Window.partitionBy("t").orderBy("doc_id")
    gaps = posting.select(
        "t", "doc_id", (F.col("doc_id") - F.lag("doc_id").over(wlag)).alias("g")
    )
    first_bits = F.length(F.bin(F.col("doc_id") + 1))
    gap_bits = F.length(F.bin(F.col("g")))
    bitlen = F.when(F.col("g").isNull(), first_bits).otherwise(gap_bits)
    per_tok = gaps.groupBy("t").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(bitlen).cast("long").alias("gap_bitlen_sum"),
        F.sum(F.expr(
            "case when g is null then 8 * ((length(bin(doc_id + 1)) + 6) div 7)"
            " else 8 * ((length(bin(g)) + 6) div 7) end"
        )).cast("long").alias("varint_bits"),
    )
    sized = per_tok.crossJoin(F.broadcast(u)).select(
        F.col("t").alias("token"),
        "df",
        F.col("u").alias("universe"),
        (
            F.col("df")
            * (2 + F.greatest(F.length(F.bin(F.expr("u div df"))) - 1, F.lit(0)))
        )
        .cast("long")
        .alias("ef_bits"),
        F.col("u").cast("long").alias("bitmap_bits"),
        "varint_bits",
    )
    best = (
        F.when(
            (F.col("ef_bits") <= F.col("bitmap_bits"))
            & (F.col("ef_bits") <= F.col("varint_bits")),
            F.lit("elias_fano"),
        )
        .when(F.col("bitmap_bits") <= F.col("varint_bits"), F.lit("bitmap"))
        .otherwise(F.lit("varint"))
    )
    return (
        sized.withColumn("best_encoding", best)
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(_Q212_TOPK)
    )


# ---------------------------------------------------------------------
# q213
_Q213_ZONES = 64
_Q213_QBITS = 4  # per-dimension quantization for the Morton key
# the 2-D box predicate (chosen to select a narrow slice of each dim)
_Q213_C_LO, _Q213_C_HI = 200, 800
_Q213_K_LO, _Q213_K_HI = 100, 300

_Q213_K2 = f"CAST({md5_bucket_sql('doc_id', 1024)} AS BIGINT)"  # 2nd dim


def _q213_morton_sql(qa: str, qb: str) -> str:
    # 4+4-bit interleave: sum of shifted bits, pure integer arithmetic
    terms = []
    for i in range(_Q213_QBITS):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


_Q213_ORACLE = f"""
WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS c, {_Q213_K2} AS k
  FROM documents
),
g AS (
  SELECT CAST(MIN(doc_id) AS BIGINT) AS dmin,
         CAST(MAX(doc_id) - MIN(doc_id) + 1 AS BIGINT) AS dspan,
         CAST(MAX(c) + 1 AS BIGINT) AS cmax
  FROM d
),
keyed AS (
  SELECT d.c, d.k,
         CAST(({_Q213_ZONES} * (d.doc_id - g.dmin)) // g.dspan AS BIGINT)
           AS zone_linear,
         CAST(({_q213_morton_sql(
             f"(({1 << _Q213_QBITS} * d.c) // g.cmax)",
             f"(d.k // {1024 // (1 << _Q213_QBITS)})")})
           // {(1 << (2 * _Q213_QBITS)) // _Q213_ZONES} AS BIGINT) AS zone_z
  FROM d CROSS JOIN g
),
layouts AS (
  SELECT 'linear' AS layout, zone_linear AS zone, c, k FROM keyed
  UNION ALL
  SELECT 'zorder', zone_z, c, k FROM keyed
),
zones AS (
  SELECT layout, zone,
         CAST(COUNT(*) AS BIGINT) AS zrows,
         CAST(MIN(c) AS BIGINT) AS cmin, CAST(MAX(c) AS BIGINT) AS cmaxz,
         CAST(MIN(k) AS BIGINT) AS kmin, CAST(MAX(k) AS BIGINT) AS kmaxz,
         CAST(SUM(CASE WHEN c BETWEEN {_Q213_C_LO} AND {_Q213_C_HI}
                        AND k BETWEEN {_Q213_K_LO} AND {_Q213_K_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS zmatch
  FROM layouts GROUP BY layout, zone
),
flagged AS (
  SELECT layout, zone, zrows, zmatch,
         (cmaxz < {_Q213_C_LO} OR cmin > {_Q213_C_HI}
          OR kmaxz < {_Q213_K_LO} OR kmin > {_Q213_K_HI}) AS pruned
  FROM zones
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_zones,
       CAST(SUM(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
       CAST(SUM(CASE WHEN pruned THEN 0 ELSE zrows END) AS BIGINT)
         AS rows_scanned,
       CAST(SUM(zmatch) AS BIGINT) AS rows_matched,
       CAST(CASE WHEN SUM(zmatch) = 0 THEN -1
            ELSE (1000000 * SUM(CASE WHEN pruned THEN 0 ELSE zrows END))
                 // SUM(zmatch) END AS BIGINT) AS scan_amp_u
FROM flagged
GROUP BY layout
"""


@register("q213_zone_map_pruning", oracle=_Q213_ORACLE)
def q213_zone_map_pruning(spark, sf_dir):
    from sparkextract.queries.base import md5_bucket

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("c"),
        md5_bucket(F.col("doc_id"), 1024).alias("k"),
    )
    g = d.agg(
        F.min("doc_id").cast("long").alias("dmin"),
        (F.max("doc_id") - F.min("doc_id") + 1).cast("long").alias("dspan"),
        (F.max("c") + 1).cast("long").alias("cmax"),
    )
    j = d.crossJoin(F.broadcast(g))
    qa = F.expr(f"({1 << _Q213_QBITS} * c) div cmax")
    qb = F.expr(f"k div {1024 // (1 << _Q213_QBITS)}")
    morton = None
    for i in range(_Q213_QBITS):
        ta = F.shiftleft(F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        tb = F.shiftleft(F.shiftright(qb, i).bitwiseAND(F.lit(1)), 2 * i)
        morton = ta + tb if morton is None else morton + ta + tb
    keyed = j.select(
        "c",
        "k",
        F.expr(f"({_Q213_ZONES} * (doc_id - dmin)) div dspan")
        .cast("long")
        .alias("zone_linear"),
        (morton / ((1 << (2 * _Q213_QBITS)) // _Q213_ZONES))
        .cast("long")
        .alias("zone_z"),
    )
    layouts = keyed.select(
        F.lit("linear").alias("layout"), F.col("zone_linear").alias("zone"), "c", "k"
    ).unionByName(
        keyed.select(
            F.lit("zorder").alias("layout"), F.col("zone_z").alias("zone"), "c", "k"
        )
    )
    in_box = (
        F.col("c").between(_Q213_C_LO, _Q213_C_HI)
        & F.col("k").between(_Q213_K_LO, _Q213_K_HI)
    )
    zones = layouts.groupBy("layout", "zone").agg(
        F.count("*").cast("long").alias("zrows"),
        F.min("c").alias("cmin"),
        F.max("c").alias("cmaxz"),
        F.min("k").alias("kmin"),
        F.max("k").alias("kmaxz"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("long").alias("zmatch"),
    )
    pruned = (
        (F.col("cmaxz") < _Q213_C_LO)
        | (F.col("cmin") > _Q213_C_HI)
        | (F.col("kmaxz") < _Q213_K_LO)
        | (F.col("kmin") > _Q213_K_HI)
    )
    flagged = zones.withColumn("pruned", pruned)
    scanned = F.sum(F.when(F.col("pruned"), 0).otherwise(F.col("zrows")))
    return flagged.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_zones"),
        F.sum(F.when(F.col("pruned"), 1).otherwise(0)).cast("long").alias("n_pruned"),
        scanned.cast("long").alias("rows_scanned"),
        F.sum("zmatch").cast("long").alias("rows_matched"),
        F.when(F.sum("zmatch") == 0, F.lit(-1))
        .otherwise(
            F.expr(
                "(1000000 * sum(case when pruned then 0 else zrows end))"
                " div sum(zmatch)"
            )
        )
        .cast("long")
        .alias("scan_amp_u"),
    )
