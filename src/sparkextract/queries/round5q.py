"""Round-5 continuation wave 15: mergeable heavy-hitter summaries and
time-decayed popularity.

q179 — MISRA-GRIES MERGEABLE HEAVY HITTERS (Misra & Gries 1982;
merge rule of Agarwal et al., "Mergeable Summaries", PODS 2012). The
bounded-size frequent-items summary: each partition compresses its
token counts to k counters by subtracting the (k+1)-th largest count
and dropping non-positives; summaries MERGE by summing counters and
compressing again, and every subtraction is accounted, so
est <= true <= est + (sum of all subtracted offsets). At 100 TB this
is the point: the merge shuffle carries P*k counter rows instead of
the vocabulary — the full (pid, token) groupBy exists here only
because the audit's oracle needs the SQL-expressible form (a
mapPartitions build would shuffle nothing but the summaries). The
verdict table carries per-hitter est, exact, error and the accounted
bound, with the bound PROVEN to hold row by row. Deterministic total
order (count desc, token asc) everywhere a rank is taken.

q180 — EXPONENTIAL-DECAY POPULARITY (time-decayed counters). The
monitoring primitive behind "trending now": each event contributes
2^(-age/half_life), so old mass fades without any windowed state. The
engine-portable discipline: age is quantized to integer decay steps
(1 h), the per-event weight 2^-e for e <= 18 is an EXACT decimal
literal (2^-e = 5^e * 10^-e, so scale-18 decimals represent it
exactly), and the per-type decayed mass is an exact order-free
DECIMAL(38,18) sum — one mergeable groupBy, no window, no IEEE
accumulation. Verdict: per event type the raw count rank vs the
decayed-mass rank with a changed flag — recency re-ranking made
executable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import (
    load,
    md5_bucket,
    md5_bucket_sql,
    register,
)

# --------------------------------------------------------------------------
_Q179_P = 8  # summary-building partitions
_Q179_K = 16  # counters per summary

_Q179_ORACLE = f"""
WITH tok AS (
  SELECT {md5_bucket_sql("doc_id", _Q179_P)} AS pid, t AS token
  FROM (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      AS t
    FROM documents
  )
),
pc AS (
  SELECT pid, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok
  GROUP BY pid, token
),
pranked AS (
  SELECT pid, token, cnt,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cnt DESC, token) AS rn
  FROM pc
),
poff AS (
  SELECT pid, MAX(CASE WHEN rn = {_Q179_K + 1} THEN cnt ELSE 0 END) AS off
  FROM pranked GROUP BY pid
),
psum AS (
  SELECT r.pid, r.token, r.cnt - o.off AS est
  FROM pranked r JOIN poff o ON o.pid = r.pid
  WHERE r.rn <= {_Q179_K} AND r.cnt - o.off > 0
),
merged AS (
  SELECT token, CAST(SUM(est) AS BIGINT) AS est FROM psum GROUP BY token
),
mranked AS (
  SELECT token, est,
         ROW_NUMBER() OVER (ORDER BY est DESC, token) AS rn
  FROM merged
),
moff AS (
  SELECT MAX(CASE WHEN rn = {_Q179_K + 1} THEN est ELSE 0 END) AS off
  FROM mranked
),
final AS (
  SELECT r.token, r.est - o.off AS est
  FROM mranked r, moff o
  WHERE r.rn <= {_Q179_K} AND r.est - o.off > 0
),
bound AS (
  SELECT CAST((SELECT SUM(off) FROM poff) + (SELECT off FROM moff)
         AS BIGINT) AS bound
),
exact AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact FROM tok GROUP BY token
)
SELECT f.token, CAST(f.est AS BIGINT) AS est, x.exact,
       x.exact - f.est AS err, b.bound,
       (f.est <= x.exact AND x.exact - f.est <= b.bound) AS within_bound
FROM final f JOIN exact x ON x.token = f.token CROSS JOIN bound b
"""


@register("q179_misra_gries_heavy_hitters", oracle=_Q179_ORACLE)
def q179_misra_gries_heavy_hitters(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        md5_bucket(F.col("doc_id"), _Q179_P).alias("pid"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token") != "")
    pc = tok.groupBy("pid", "token").agg(F.count("*").cast("long").alias("cnt"))
    wp = Window.partitionBy("pid").orderBy(F.desc("cnt"), F.asc("token"))
    pranked = pc.withColumn("rn", F.row_number().over(wp))
    poff = pranked.groupBy("pid").agg(
        F.max(
            F.when(F.col("rn") == _Q179_K + 1, F.col("cnt")).otherwise(0)
        ).alias("off")
    )
    psum = (
        pranked.where(F.col("rn") <= _Q179_K)
        .join(poff, "pid")
        .select("token", (F.col("cnt") - F.col("off")).alias("est"))
        .where(F.col("est") > 0)
    )
    merged = psum.groupBy("token").agg(F.sum("est").cast("long").alias("est"))
    wm = Window.orderBy(F.desc("est"), F.asc("token"))
    mranked = merged.withColumn("rn", F.row_number().over(wm))
    moff = mranked.agg(
        F.max(
            F.when(F.col("rn") == _Q179_K + 1, F.col("est")).otherwise(0)
        ).alias("moff")
    )
    final = (
        mranked.where(F.col("rn") <= _Q179_K)
        .crossJoin(F.broadcast(moff))
        .select("token", (F.col("est") - F.col("moff")).alias("est"))
        .where(F.col("est") > 0)
    )
    bound = (
        poff.agg(F.sum("off").alias("po"))
        .crossJoin(F.broadcast(moff))
        .select((F.col("po") + F.col("moff")).cast("long").alias("bound"))
    )
    exact = tok.groupBy("token").agg(F.count("*").cast("long").alias("exact"))
    return (
        final.join(exact, "token")
        .crossJoin(F.broadcast(bound))
        .select(
            "token",
            F.col("est").cast("long").alias("est"),
            "exact",
            (F.col("exact") - F.col("est")).alias("err"),
            "bound",
            (
                (F.col("est") <= F.col("exact"))
                & ((F.col("exact") - F.col("est")) <= F.col("bound"))
            ).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
_Q180_STEP_US = 3_600_000_000  # 1 h decay quantum
_Q180_MAX_E = 18  # 2^-18 < 4e-6: older mass is exactly zero weight

# exact decimal literals for 2^-e (2^-e = 5^e * 10^-e: scale e <= 18)
_Q180_WEIGHTS = {
    e: ("{0:.18f}".format(0.5**e) if e else "1.000000000000000000")
    for e in range(_Q180_MAX_E + 1)
}


def _q180_weight_case(evar: str) -> str:
    arms = " ".join(
        f"WHEN {e} THEN CAST({w} AS DECIMAL(20,18))"
        for e, w in _Q180_WEIGHTS.items()
    )
    return f"CASE {evar} {arms} ELSE CAST(0 AS DECIMAL(20,18)) END"


_Q180_ORACLE = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS t_us FROM events
),
t0 AS (SELECT MAX(t_us) AS tmax FROM ev),
w AS (
  SELECT event_type,
    {_q180_weight_case(f"LEAST((t0.tmax - t_us) // {_Q180_STEP_US}, {_Q180_MAX_E})")}
      AS wgt
  FROM ev, t0
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(wgt) AS DECIMAL(38,18)) AS decayed
  FROM w GROUP BY event_type
)
SELECT event_type, n_events,
  CAST(ROUND(decayed, 6) AS DOUBLE) AS decayed_mass,
  CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, event_type) AS BIGINT)
    AS rank_raw,
  CAST(ROW_NUMBER() OVER (ORDER BY decayed DESC, event_type) AS BIGINT)
    AS rank_decayed,
  (ROW_NUMBER() OVER (ORDER BY n_events DESC, event_type)
   <> ROW_NUMBER() OVER (ORDER BY decayed DESC, event_type)) AS rank_changed
FROM agg
"""


@register("q180_decayed_popularity", oracle=_Q180_ORACLE)
def q180_decayed_popularity(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us")
    )
    t0 = ev.agg(F.max("t_us").alias("tmax"))
    e = F.least(
        F.expr(f"(tmax - t_us) div {_Q180_STEP_US}"), F.lit(_Q180_MAX_E)
    )
    wgt = None
    for k, lit in _Q180_WEIGHTS.items():
        arm = F.lit(lit).cast("decimal(20,18)")
        wgt = F.when(e == k, arm) if wgt is None else wgt.when(e == k, arm)
    wgt = wgt.otherwise(F.lit("0").cast("decimal(20,18)"))
    agg = (
        ev.crossJoin(F.broadcast(t0))
        .select("event_type", wgt.alias("wgt"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("wgt").cast("decimal(38,18)").alias("decayed"),
        )
    )
    wraw = Window.orderBy(F.desc("n_events"), F.asc("event_type"))
    wdec = Window.orderBy(F.desc("decayed"), F.asc("event_type"))
    return agg.select(
        "event_type",
        "n_events",
        # ROUND in decimal before the double cast: a scale-18 sum's
        # scaled integer passes 2^53, where DuckDB's decimal->double
        # double-rounds (the documented scale-8 bug class)
        F.round(F.col("decayed"), 6).cast("double").alias("decayed_mass"),
        F.row_number().over(wraw).cast("long").alias("rank_raw"),
        F.row_number().over(wdec).cast("long").alias("rank_decayed"),
        (
            F.row_number().over(wraw) != F.row_number().over(wdec)
        ).alias("rank_changed"),
    )
