"""Round-5 continuation wave 8: crawl-politeness rate auditing.

q163 — SLIDING-WINDOW RATE-LIMIT AUDIT. A polite crawler (and any
ingestion quota) is specified as "at most L requests in any sliding
W-second window per principal"; the audit computes, per user, the
MAXIMUM attained 60-second rate and flags violators. The sliding count
is a RANGE-frame window over exact integer event-time microseconds
(unix_micros in Spark, epoch_us in DuckDB — BIGINT in both, so frame
membership is bit-identical; equal timestamps are frame peers in both
engines by the SQL standard). Reference analog: the per-request
pacing/retry throttle in the reference's serving client
(/root/reference/src/rag/ollama_client.py) lifted to an auditable
batch query.
Scale shape: ONE user_id-keyed shuffle; the RANGE window runs inside
each user's partition ordered by event time (bounded per principal —
never a global window), and the verdict is a map-side-combinable
groupBy(user_id) max. Integer-only, zero IEEE operations.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkextract.queries.base import load, register

_Q163_WINDOW_US = 60_000_000  # 60-second sliding window
_Q163_LIMIT = 5               # max events allowed per window

_Q163_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t_us FROM events
),
rated AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY t_us
           RANGE BETWEEN {_Q163_WINDOW_US} PRECEDING AND CURRENT ROW)
           AS rate_60s
  FROM e
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(rate_60s) AS BIGINT) AS max_rate_60s,
       (MAX(rate_60s) > {_Q163_LIMIT}) AS violates
FROM rated GROUP BY user_id
"""


@register("q163_rate_limit_audit", oracle=_Q163_ORACLE)
def q163_rate_limit_audit(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    # user-keyed RANGE window: partitions are bounded per principal,
    # never a global ordering
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-_Q163_WINDOW_US, 0)
    )
    rated = e.select("user_id", F.count("*").over(w).alias("rate_60s"))
    return rated.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("rate_60s").cast("long").alias("max_rate_60s"),
        (F.max("rate_60s") > _Q163_LIMIT).alias("violates"),
    )
