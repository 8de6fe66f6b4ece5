"""Relational operator surface (SURVEY.md §2.3-2.7): aggregations, joins,
windows, top-k, dedup — each with a DuckDB oracle twin.

Naming convention: every computed column is aliased identically in the
Spark plan and the oracle SQL (driver hashes sort columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkextract.queries.base import dsum, load, register


def _dec(col):
    """Decimal-exact view of a double column (order-independent sums)."""
    return F.col(col).cast("decimal(18,4)")


# --------------------------------------------------------------------------
# A5/A7 grouped aggregation — TPC-H Q1 shape (pricing summary).
# Scale note: partial (map-side) agg + final agg, no row explosion; the
# filter pushes to the parquet scan.
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')} AS sum_qty,
           {dsum('l_extendedprice')} AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order,
           {dsum('l_quantity')} / COUNT(*) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.round(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")),
            4,
        )
        .cast("double")
        .alias("sum_disc_price"),
        F.count("*").alias("count_order"),
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
    )


# --------------------------------------------------------------------------
# T1/T2 top-k after join-aggregate (kNN `ORDER BY ... LIMIT k` shape).
@register(
    "q02_top_revenue_orders",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q02_top_revenue_orders(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# J3 shape: star join through broadcast dims (lineitem→orders→customer→
# nation→region). Dims are broadcast explicitly — at 100 TB the fact side
# never shuffles for these joins.
@register(
    "q03_region_sales",
    oracle=f"""
    SELECT r.r_name,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q03_region_sales(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")),
                4,
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# A5 analog on the documents table: per-(lang, source) content stats.
@register(
    "q04_doc_stats",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q04_doc_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# A7 grouped stats + epoch-projected timestamps.
@register(
    "q05_event_type_stats",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum('value')} AS sum_value,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us
    FROM events
    GROUP BY event_type
    """,
)
def q05_event_type_stats(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")  # parquet reads as NTZ; session TZ is UTC
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
        F.unix_micros(F.min(ts)).alias("first_us"),
        F.unix_micros(F.max(ts)).alias("last_us"),
    )


# --------------------------------------------------------------------------
# W4/T3 top-k per group via row_number (rank-and-take-top-k).
@register(
    "q06_topk_events_per_user",
    oracle="""
    SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def q06_topk_events_per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


# --------------------------------------------------------------------------
# W5 cumulative window (running sum, unboundedPreceding..currentRow).
@register(
    "q07_running_value",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
)
def q07_running_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


# --------------------------------------------------------------------------
# W5 exact analog: context assembly under a running-length budget
# (reference rag_pipeline.py:582-618 — cumulative length <= 4000).
@register(
    "q08_context_budget",
    oracle="""
    SELECT source, doc_id, CAST(cum_chars AS BIGINT) AS cum_chars FROM (
      SELECT source, doc_id,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars
      FROM documents
    ) WHERE cum_chars <= 4000
    """,
)
def q08_context_budget(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = (
        W.partitionBy("source")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        docs.withColumn("cum_chars", F.sum("n_chars").over(w))
        .filter(F.col("cum_chars") <= 4000)
        .select("source", "doc_id", "cum_chars")
    )


# --------------------------------------------------------------------------
# W1: the running chunk_index — dense 0-based ordinal per partition key
# (the `offset` of the output span model).
@register(
    "q09_chunk_index",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) - 1 AS BIGINT) AS offset
    FROM documents
    """,
)
def q09_chunk_index(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.asc("doc_id"))
    return docs.select(
        "doc_id", "source", (F.row_number().over(w) - 1).cast("long").alias("offset")
    )


# --------------------------------------------------------------------------
# Sessionization via lag (gap > 30 min starts a new session) — the
# window-shaped operator family's stateful cousin, batch form.
@register(
    "q10_sessionize",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 + SUM(is_new) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    GROUP BY user_id
    """,
)
def q10_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    ts = F.col("ts").cast("timestamp")  # NTZ -> LTZ under UTC session
    gap = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    return (
        ev.withColumn("is_new", F.when(gap > 1_800_000_000, 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.lit(1) + F.sum("is_new")).cast("long").alias("n_sessions"),
        )
    )


# --------------------------------------------------------------------------
# J2: anti-join (the resume/skip-if-processed operator) — customers that
# placed no order above the threshold.
@register(
    "q14_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def q14_anti_join(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Left-semi probe (EXISTS): the duplicate-document check J2's positive twin.
@register(
    "q15_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def q15_semi_join(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Broadcast dim join + grouped top-k (A4 argmax family).
@register(
    "q16_brand_revenue",
    oracle=f"""
    SELECT p.p_brand,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY revenue DESC, p_brand ASC
    LIMIT 5
    """,
)
def q16_brand_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")),
                4,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(5)
    )


# --------------------------------------------------------------------------
# T1: global top-k with full tie-break.
@register(
    "q17_top_docs_by_chars",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """,
)
def q17_top_docs_by_chars(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10).select("doc_id", "n_chars")


# --------------------------------------------------------------------------
# D1: priority dedup via row_number (first-writer-wins on a key with an
# explicit priority order — reference form_extractor.py:478-506).
@register(
    "q12_dedup_priority",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY value DESC, ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q12_dedup_priority(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("value"), F.asc("ts"), F.asc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --------------------------------------------------------------------------
# Rollup (Spark gives grouping sets for free — SURVEY §2.4 note).
@register(
    "q29_rollup_lineitem",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q29_rollup_lineitem(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# Manual pivot (per-lang source histogram) — FILTER-agg form in both.
@register(
    "q30_lang_pivot",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n_src0,
           CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n_src1,
           CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS n_src2
    FROM documents GROUP BY lang
    """,
)
def q30_lang_pivot(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("n_src0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("n_src1"),
        F.sum(F.when(F.col("source") == "src2", 1).otherwise(0)).alias("n_src2"),
    )


# --------------------------------------------------------------------------
# Share-of-total via window over aggregate (priority mix).
@register(
    "q33_priority_share",
    oracle="""
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share
    FROM (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority)
    """,
)
def q33_priority_share(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    return agg.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.round(F.col("n").cast("double") / F.sum("n").over(W.partitionBy()), 6).alias("share"),
    )
