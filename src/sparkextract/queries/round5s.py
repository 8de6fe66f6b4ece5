"""Round-5 continuation wave 17: streaming-watermark semantics as a
batch audit, and the entity-resolution composition of the linkage tier.

q183 — WATERMARK LATE-EVENT AUDIT. Choosing a Structured Streaming
watermark delay D is a data decision: too small silently drops late
events, too large bloats state. The audit replays each event stream
(event_type) in arrival order (event_id) and applies Spark's
watermark rule exactly — an event is DROPPED if its event time is
older than (max event time seen so far) - D, LATE-ACCEPTED if older
than the running max but within D — using an exclusive running-max
window (ROWS UNBOUNDED PRECEDING TO 1 PRECEDING), all in exact BIGINT
microseconds. Verdict per stream: on-time / late-accepted / dropped
counts and the maximum observed lateness — the number you read before
picking D. Scale shape: ONE stream-keyed window (arrival order is a
per-stream property, so no global sort) + a mergeable rollup.

q184 — FELLEGI-SUNTER ENTITY RESOLUTION (linkage -> entities). The
composition the linkage tier exists for: q176's scored candidate
pairs above the accept threshold become edges, connected components
(q71's min-label iteration, convergence-bounded) merge transitively
linked records, and every record — linked or not — lands in exactly
one entity. Verdict per entity: record count, clean/dirty splits and
the is_pure flag (exactly one clean + one dirty record = the ideal
1:1 match), plus the n_true_pairs evidence column. Scale shape: edges
come from the blocked equi-join (never all-pairs), each propagation
round is one edge-keyed shuffle over the LINKED subgraph only
(singletons never enter the loop), and the loop is convergence-bounded
with a loud failure guard. Oracle: DuckDB recursive CTE computing the
same min-reachable-id fixed point (the q71 pattern).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, register
from sparkextract.queries.round5p import (
    _Q176_AGREE,
    _Q176_DIRTY,
    _Q176_FIELDS,
    fs_scored_pairs,
)

# --------------------------------------------------------------------------
_Q183_DELAY_US = 3_600_000_000  # watermark delay D = 1 h

_Q183_ORACLE = f"""
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us FROM events
),
marked AS (
  SELECT event_type, t_us,
         MAX(t_us) OVER (PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS seen_max
  FROM ev
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN seen_max IS NULL OR t_us >= seen_max
           THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
  CAST(SUM(CASE WHEN t_us < seen_max
                 AND t_us >= seen_max - {_Q183_DELAY_US}
           THEN 1 ELSE 0 END) AS BIGINT) AS n_late_accepted,
  CAST(SUM(CASE WHEN t_us < seen_max - {_Q183_DELAY_US}
           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  CAST(MAX(CASE WHEN seen_max IS NULL THEN 0
            ELSE GREATEST(seen_max - t_us, 0) END) AS BIGINT)
    AS max_lateness_us
FROM marked GROUP BY event_type
"""


@register("q183_watermark_late_events", oracle=_Q183_ORACLE)
def q183_watermark_late_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "event_type", "t_us", F.max("t_us").over(w).alias("seen_max")
    )
    on_time = F.col("seen_max").isNull() | (F.col("t_us") >= F.col("seen_max"))
    dropped = F.col("t_us") < F.col("seen_max") - _Q183_DELAY_US
    return marked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(on_time, 1).otherwise(0)).cast("long").alias("n_on_time"),
        F.sum(F.when(~on_time & ~dropped, 1).otherwise(0))
        .cast("long")
        .alias("n_late_accepted"),
        F.sum(F.when(dropped, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.max(
            F.when(F.col("seen_max").isNull(), 0).otherwise(
                F.greatest(F.col("seen_max") - F.col("t_us"), F.lit(0))
            )
        )
        .cast("long")
        .alias("max_lateness_us"),
    )


# --------------------------------------------------------------------------
_Q184_THRESHOLD = 4  # q176's middle decision threshold
_Q184_MAX_ITERS = 30


def _q184_scored_sql() -> str:
    """The q176 oracle's scoring chain, kept textually in lockstep with
    round5p._q176_oracle, emitting pair-grain (c_custkey, d_key, score)."""
    mu = ", ".join(
        f"SUM(CASE WHEN is_match THEN a_{f} ELSE 0 END) AS m_{f}, "
        f"SUM(CASE WHEN is_match THEN 0 ELSE a_{f} END) AS u_{f}"
        for f in _Q176_FIELDS
    )
    wdefs = ", ".join(
        f"CAST(ROUND(ln(((m_{f} + 1.0) / (n_match + 2.0))"
        f" / ((u_{f} + 1.0) / (n_non + 2.0))), 6) AS DECIMAL(18,6)) AS wa_{f}, "
        f"CAST(ROUND(ln((1.0 - (m_{f} + 1.0) / (n_match + 2.0))"
        f" / (1.0 - (u_{f} + 1.0) / (n_non + 2.0))), 6) AS DECIMAL(18,6))"
        f" AS wd_{f}"
        for f in _Q176_FIELDS
    )
    score = " + ".join(
        f"CASE WHEN a_{f} = 1 THEN w.wa_{f} ELSE w.wd_{f} END"
        for f in _Q176_FIELDS
    )
    return f"""
dirty AS (
  {_Q176_DIRTY}
),
agree AS (
  {_Q176_AGREE}
),
mu AS (
  SELECT CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT) AS n_non,
         {mu}
  FROM agree
),
w AS (SELECT n_match, n_non, {wdefs} FROM mu),
scored AS (
  SELECT a.c_custkey, a.d_key, a.is_match, CAST({score} AS DOUBLE) AS score
  FROM agree a, w
)"""


def _q184_oracle() -> str:
    return f"""
WITH RECURSIVE {_q184_scored_sql()},
links AS (
  SELECT c_custkey AS a, d_key AS b FROM scored
  WHERE score >= {_Q184_THRESHOLD}
),
true_pairs AS (
  SELECT CAST(SUM(CASE WHEN is_match AND score >= {_Q184_THRESHOLD}
              THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs
  FROM scored
),
nodes AS (
  SELECT c_custkey AS id FROM customer
  UNION
  SELECT d_key FROM dirty
),
edges AS (
  SELECT a, b FROM links UNION ALL SELECT b, a FROM links
),
reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id
),
ent AS (
  SELECT id, MIN(lbl) AS entity_id FROM reach GROUP BY id
),
rolled AS (
  SELECT entity_id,
         CAST(COUNT(*) AS BIGINT) AS n_records,
         CAST(SUM(CASE WHEN id < 100000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clean,
         CAST(SUM(CASE WHEN id >= 100000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dirty
  FROM ent GROUP BY entity_id
)
SELECT r.entity_id, r.n_records, r.n_clean, r.n_dirty,
       (r.n_clean = 1 AND r.n_dirty = 1) AS is_pure,
       t.n_true_pairs
FROM rolled r, true_pairs t
"""


@register("q184_entity_resolution", oracle=_q184_oracle())
def q184_entity_resolution(spark, sf_dir):
    scored = fs_scored_pairs(spark, sf_dir)
    links = scored.where(F.col("score") >= _Q184_THRESHOLD).select(
        F.col("c_custkey").alias("a"), F.col("d_key").alias("b")
    )
    true_pairs = scored.agg(
        F.sum(
            F.when(
                F.col("is_match") & (F.col("score") >= _Q184_THRESHOLD), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_true_pairs")
    )
    edges = links.unionByName(
        links.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    # min-label propagation over the LINKED subgraph only (q71's loop
    # shape, convergence-bounded); singleton records never enter it
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint()
    )
    for _i in range(_Q184_MAX_ITERS):
        prop = (
            edges.join(labels, edges["a"] == labels["id"])
            .select(F.col("b").alias("id"), "lbl")
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            prop.join(
                labels.withColumnRenamed("lbl", "old"), "id", "left"
            )
            .where(
                F.col("old").isNull() | (F.col("lbl") != F.col("old"))
            )
            .limit(1)
            .count()
        )
        labels = prop
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"entity resolution did not converge in {_Q184_MAX_ITERS} rounds"
        )
    cust_ids = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )
    dirty_ids = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + 100000).alias("id")
    )
    nodes = cust_ids.unionByName(dirty_ids)
    ent = nodes.join(labels, "id", "left").select(
        "id", F.coalesce("lbl", F.col("id")).alias("entity_id")
    )
    rolled = ent.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum(F.when(F.col("id") < 100000, 1).otherwise(0))
        .cast("long")
        .alias("n_clean"),
        F.sum(F.when(F.col("id") >= 100000, 1).otherwise(0))
        .cast("long")
        .alias("n_dirty"),
    )
    return rolled.crossJoin(F.broadcast(true_pairs)).select(
        "entity_id",
        "n_records",
        "n_clean",
        "n_dirty",
        ((F.col("n_clean") == 1) & (F.col("n_dirty") == 1)).alias("is_pure"),
        "n_true_pairs",
    )
