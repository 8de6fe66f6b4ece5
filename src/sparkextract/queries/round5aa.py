"""Round-5 continuation wave 25: cuckoo-filter membership and
Benford's-law forensics.

q198 — CUCKOO-FILTER PROBE (Fan et al. 2014) — q104's Bloom filter
replaced by the filter modern systems prefer (supports deletion,
better space at low FP rates): each key stores a 12-bit FINGERPRINT in
one of TWO candidate buckets, i1 = H(key) and i2 = i1 XOR H(fp) (the
partial-key trick: i2 is computable from (i1, fp) alone — asserted by
the pytest, it's what makes deletion/relocation possible). This is the
static no-eviction form: the filter is the exploded (bucket, fp) pair
set of the eval side's k-gram keys; a probe key is positive iff either
of ITS two (bucket, fp) pairs is present. False negatives are
impossible by construction; false positives are fingerprint
collisions inside shared candidate buckets — reported per document
exactly like q104 so the two filters are directly comparable on the
same corpus (same eval slice, same k-grams, same injected verbatim
copies via doc_id + 3000000).
Reference analog: the SHA-256 ingest probe
(/root/reference/src/rag/rag_pipeline.py:97-105) as a deletable
probabilistic prefilter.

Scale shape: the filter is |eval keys| x 2 rows of (bucket, fp) —
mergeable distinct, broadcastable; the probe is a broadcast LEFT SEMI
shape (left join + flag) on (bucket, fp); the exact audit join is the
same broadcast-kh join as q91/q104. The corpus shuffles only for the
final per-doc rollup.

q199 — BENFORD'S-LAW FIRST-DIGIT AUDIT (Newcomb 1881; Benford 1938) —
the forensic screen auditors run over reported counts: in scale-
spanning natural data the leading digit d appears with probability
log10(1 + 1/d). Applied to the document n_chars column: per digit,
observed count vs Benford expectation, the chi-square contribution,
and the mean-absolute-deviation (MAD in proportion micro-units) that
practitioners threshold (Nigrini: MAD > 0.015 = nonconformity). A
synthetic corpus with a narrow length distribution FAILS Benford — and
that is the point of the audit as a data-forensics primitive: it
flags distributions that are templated/truncated rather than natural.
The verdict column ships the Nigrini banding so the result is a
decision, not just a table.

Scale shape: one map-side first-digit projection + a 9-group mergeable
count; everything after operates on 9 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkextract.queries.base import load, md5_bucket, md5_bucket_sql, register

# ---------------------------------------------------------------------
# q198
_Q198_K = 13  # k-gram width, = q104
_Q198_EVAL_BUCKETS = 20  # same eval slice as q91/q104
_Q198_M = 4096  # buckets (power of two so XOR stays in range)
_Q198_FPBITS = 12  # fingerprint width


def _q198_fp_sql(kh: str) -> str:
    # nonzero 12-bit fingerprint (0 is reserved for 'empty' in a real
    # cuckoo table; +1 keeps the range 1..4095 without bias worth
    # caring about at audit scale)
    return (
        f"CAST(('0x' || SUBSTRING(md5({kh} || ':fp'), 1, 8)) AS UBIGINT)"
        f" % {(1 << _Q198_FPBITS) - 1} + 1"
    )


def _q198_i1_sql(kh: str) -> str:
    return (
        f"CAST(('0x' || SUBSTRING(md5({kh} || ':b'), 1, 8)) AS UBIGINT)"
        f" % {_Q198_M}"
    )


def _q198_i2_sql(kh: str) -> str:
    # partial-key cuckoo: i2 = i1 XOR H(fp)
    return (
        f"xor({_q198_i1_sql(kh)}, "
        f"CAST(('0x' || SUBSTRING(md5(CAST({_q198_fp_sql(kh)} AS VARCHAR) || ':h'), 1, 8))"
        f" AS UBIGINT) % {_Q198_M})"
    )


_Q198_KGRAMS = f"""
  SELECT doc_id, md5(kgram) AS kh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a) - {_Q198_K} + 2),
                  i -> array_to_string(a[i:i+{_Q198_K - 1}], ' '))) AS kgram
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS a
          FROM __SRC__)
    WHERE len(a) >= {_Q198_K})
"""

_Q198_ORACLE = f"""
WITH ekh AS (
  SELECT DISTINCT kh FROM (
    {_Q198_KGRAMS.replace("__SRC__", f"(SELECT doc_id, text FROM documents WHERE {md5_bucket_sql('doc_id', _Q198_EVAL_BUCKETS)} = 0)")}
  )
),
filt AS (
  SELECT DISTINCT b, fp FROM (
    SELECT CAST({_q198_i1_sql("kh")} AS BIGINT) AS b,
           CAST({_q198_fp_sql("kh")} AS BIGINT) AS fp FROM ekh
    UNION ALL
    SELECT CAST({_q198_i2_sql("kh")} AS BIGINT) AS b,
           CAST({_q198_fp_sql("kh")} AS BIGINT) AS fp FROM ekh
  )
),
corpus AS (
  SELECT doc_id, text FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q198_EVAL_BUCKETS)} <> 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, text FROM documents
  WHERE {md5_bucket_sql("doc_id", _Q198_EVAL_BUCKETS)} = 0
),
ckh AS (
  SELECT DISTINCT doc_id, kh FROM ({_Q198_KGRAMS.replace("__SRC__", "corpus")})
),
probed AS (
  SELECT c.doc_id,
         (f1.fp IS NOT NULL OR f2.fp IS NOT NULL) AS cuckoo_hit,
         (e.kh IS NOT NULL) AS exact_hit
  FROM ckh c
  LEFT JOIN filt f1 ON f1.b = CAST({_q198_i1_sql("c.kh")} AS BIGINT)
                   AND f1.fp = CAST({_q198_fp_sql("c.kh")} AS BIGINT)
  LEFT JOIN filt f2 ON f2.b = CAST({_q198_i2_sql("c.kh")} AS BIGINT)
                   AND f2.fp = CAST({_q198_fp_sql("c.kh")} AS BIGINT)
  LEFT JOIN ekh e ON e.kh = c.kh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_kgrams,
       CAST(SUM(CASE WHEN cuckoo_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_cuckoo,
       CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN cuckoo_hit AND NOT exact_hit THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM probed
GROUP BY doc_id
"""


def _q198_fp(kh):
    return (
        F.conv(F.substring(F.md5(F.concat(kh, F.lit(":fp"))), 1, 8), 16, 10).cast(
            "long"
        )
        % ((1 << _Q198_FPBITS) - 1)
        + 1
    )


def _q198_i1(kh):
    return (
        F.conv(F.substring(F.md5(F.concat(kh, F.lit(":b"))), 1, 8), 16, 10).cast(
            "long"
        )
        % _Q198_M
    )


def _q198_i2(kh):
    hfp = (
        F.conv(
            F.substring(
                F.md5(F.concat(_q198_fp(kh).cast("string"), F.lit(":h"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _Q198_M
    )
    return _q198_i1(kh).bitwiseXOR(hfp)


def _q198_kgrams(df):
    a = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    kgram = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("a") - _Q198_K + 1, F.lit(0))),
        lambda i: F.array_join(F.slice("a", i, _Q198_K), " "),
    )
    return (
        df.select("doc_id", a.alias("a"))
        .filter(F.size("a") >= _Q198_K)
        .select("doc_id", F.explode(kgram).alias("kgram"))
        .select("doc_id", F.md5("kgram").alias("kh"))
        .distinct()
    )


@register("q198_cuckoo_filter_probe", oracle=_Q198_ORACLE)
def q198_cuckoo_filter_probe(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = md5_bucket(F.col("doc_id"), _Q198_EVAL_BUCKETS) == 0
    ekh = _q198_kgrams(docs.filter(is_eval)).select("kh").distinct()
    filt = (
        ekh.select(_q198_i1(F.col("kh")).alias("b"), _q198_fp(F.col("kh")).alias("fp"))
        .unionAll(
            ekh.select(
                _q198_i2(F.col("kh")).alias("b"), _q198_fp(F.col("kh")).alias("fp")
            )
        )
        .distinct()
    )
    corpus = docs.filter(~is_eval).unionByName(
        docs.filter(is_eval).select(
            (F.col("doc_id") + 3000000).alias("doc_id"), "text"
        )
    )
    ckh = _q198_kgrams(corpus)
    keyed = ckh.select(
        "doc_id",
        "kh",
        _q198_i1(F.col("kh")).alias("i1"),
        _q198_i2(F.col("kh")).alias("i2"),
        _q198_fp(F.col("kh")).alias("cfp"),
    )
    f1 = filt.select(F.col("b").alias("b1"), F.col("fp").alias("fp1"))
    f2 = filt.select(F.col("b").alias("b2"), F.col("fp").alias("fp2"))
    probed = (
        keyed.join(
            F.broadcast(f1),
            (F.col("i1") == F.col("b1")) & (F.col("cfp") == F.col("fp1")),
            "left",
        )
        .join(
            F.broadcast(f2),
            (F.col("i2") == F.col("b2")) & (F.col("cfp") == F.col("fp2")),
            "left",
        )
        .join(
            F.broadcast(ekh.select(F.col("kh").alias("ekh"))),
            F.col("kh") == F.col("ekh"),
            "left",
        )
        .select(
            "doc_id",
            (F.col("fp1").isNotNull() | F.col("fp2").isNotNull()).alias("cuckoo_hit"),
            F.col("ekh").isNotNull().alias("exact_hit"),
        )
    )
    return probed.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kgrams"),
        F.sum(F.when(F.col("cuckoo_hit"), 1).otherwise(0)).cast("long").alias("n_cuckoo"),
        F.sum(F.when(F.col("exact_hit"), 1).otherwise(0)).cast("long").alias("n_exact"),
        F.sum(F.when(F.col("cuckoo_hit") & ~F.col("exact_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )


# ---------------------------------------------------------------------
# q199
_Q199_ORACLE = """
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(n_chars AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM documents WHERE n_chars > 0
),
obs AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS o FROM digits GROUP BY d
),
grid AS (SELECT unnest(range(1, 10)) AS d),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits),
cells AS (
  SELECT g.d,
         COALESCE(o.o, 0) AS o,
         ROUND(CAST(n.n AS DOUBLE) * ln(1.0 + 1.0 / g.d) / ln(10.0), 6) AS e,
         n.n
  FROM grid g LEFT JOIN obs o ON o.d = g.d CROSS JOIN n
),
scored AS (
  SELECT d, o, e, n,
         ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 6)
           AS chi2_d,
         CAST(ABS(o * 1000000 - CAST(ROUND(e * 1000000) AS BIGINT))
              // n AS BIGINT) AS dev_u
  FROM cells
),
tot AS (
  SELECT ROUND(CAST(SUM(CAST(chi2_d AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS chi2_total,
         CAST(SUM(dev_u) // 9 AS BIGINT) AS mad_u
  FROM scored
)
SELECT s.d, s.o, s.e, s.chi2_d, s.dev_u, t.chi2_total, t.mad_u,
       CASE WHEN t.mad_u < 6000 THEN 'close'
            WHEN t.mad_u < 15000 THEN 'acceptable'
            ELSE 'nonconforming' END AS verdict
FROM scored s CROSS JOIN tot t
"""


@register("q199_benford_audit", oracle=_Q199_ORACLE)
def q199_benford_audit(spark, sf_dir):
    digits = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(F.substring(F.col("n_chars").cast("string"), 1, 1).cast("long").alias("d"))
    )
    obs = digits.groupBy("d").agg(F.count("*").cast("long").alias("o"))
    n = digits.agg(F.count("*").cast("long").alias("n"))
    # grid is the LEFT side of a left join — Spark cannot build-left
    # there, so no broadcast hint (the 9-row frame is trivial anyway)
    grid = obs.sparkSession.range(1, 10).select(F.col("id").cast("long").alias("d"))
    cells = (
        grid.join(obs, "d", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            F.coalesce("o", F.lit(0)).cast("long").alias("o"),
            F.round(
                F.col("n").cast("double")
                * F.log(1.0 + 1.0 / F.col("d").cast("double"))
                / F.log(F.lit(10.0)),
                6,
            ).alias("e"),
            "n",
        )
    )
    chi2_d = F.round(
        (F.col("o").cast("double") - F.col("e"))
        * (F.col("o").cast("double") - F.col("e"))
        / F.col("e"),
        6,
    )
    dev_u = F.expr(
        "abs(o * 1000000 - cast(round(e * 1000000) as bigint)) div n"
    ).cast("long")
    scored = cells.select("d", "o", "e", chi2_d.alias("chi2_d"), dev_u.alias("dev_u"), "n")
    tot = scored.agg(
        F.round(
            F.sum(F.col("chi2_d").cast("decimal(18,6)")).cast("double"), 6
        ).alias("chi2_total"),
        F.expr("sum(dev_u) div 9").cast("long").alias("mad_u"),
    )
    verdict = (
        F.when(F.col("mad_u") < 6000, F.lit("close"))
        .when(F.col("mad_u") < 15000, F.lit("acceptable"))
        .otherwise(F.lit("nonconforming"))
    )
    return (
        scored.drop("n")
        .crossJoin(F.broadcast(tot))
        .select("d", "o", "e", "chi2_d", "dev_u", "chi2_total", "mad_u", verdict.alias("verdict"))
    )
