"""Second relational battery: the remaining SURVEY.md §2 rows —
recency limits (T3), null handling (F7), set ops / additive-evolution
union (§2.7), row hashing (X6), date rollups, approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gene_etl_spark.queries.relational import load


# --------------------------------------------------------------------- #
# T3: order-by-desc limit — latest 100 events (reference: latest 100
# validation rows, app.py:404)
# --------------------------------------------------------------------- #
def q_latest_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
        .select("event_id", "ts", "user_id", "event_type")
    )


SQL_LATEST_EVENTS = """
SELECT event_id, ts, user_id, event_type
FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
"""


# --------------------------------------------------------------------- #
# F7: null/missing handling — fill_null(0.0) semantics (reference:
# etl/filters.py:64,73). The events table has no nulls, so nulls are
# introduced by an outer join (users × event types grid).
# --------------------------------------------------------------------- #
def q_null_fill_grid(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    grid = users.crossJoin(types)
    agg = ev.groupBy("user_id", "event_type").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    return grid.join(agg, ["user_id", "event_type"], "left").select(
        "user_id",
        "event_type",
        F.round(F.coalesce("total_value", F.lit(0.0)), 4).alias("total_value"),
    )


SQL_NULL_FILL_GRID = """
WITH grid AS (
  SELECT u.user_id, t.event_type
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), agg AS (
  SELECT user_id, event_type, ROUND(SUM(value), 4) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT g.user_id, g.event_type,
       ROUND(COALESCE(a.total_value, 0.0), 4) AS total_value
FROM grid g LEFT JOIN agg a
  ON g.user_id = a.user_id AND g.event_type = a.event_type
"""


# --------------------------------------------------------------------- #
# §2.7: exceptAll — keys present in one set but not another (reference
# consistency validation etl/validate.py:299-341)
# --------------------------------------------------------------------- #
def q_except_all(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderkey").alias("orderkey"))
        .exceptAll(li.select(F.col("l_orderkey").alias("orderkey")))
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders_without_items"),
            F.countDistinct("orderkey").cast("long").alias("n_distinct"),
        )
    )


SQL_EXCEPT_ALL = """
SELECT COUNT(*)::BIGINT AS n_orders_without_items,
       COUNT(DISTINCT orderkey)::BIGINT AS n_distinct
FROM (
  SELECT o_orderkey AS orderkey FROM orders
  EXCEPT ALL
  SELECT l_orderkey AS orderkey FROM lineitem
)
"""


# --------------------------------------------------------------------- #
# §2.7: unionByName with missing columns — the additive-schema-evolution
# union (old slice lacks a column; reads as null)
# --------------------------------------------------------------------- #
def q_union_evolved(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") < 500).select("event_id", "event_type")
    new = ev.where(F.col("event_id") >= 500).select(
        "event_id", "event_type", F.round("value", 4).alias("value")
    )
    merged = old.unionByName(new, allowMissingColumns=True)
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).cast("long").alias("n_pre_evolution"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


SQL_UNION_EVOLVED = """
WITH merged AS (
  SELECT event_id, event_type, NULL::DOUBLE AS value
  FROM events WHERE event_id < 500
  UNION ALL
  SELECT event_id, event_type, ROUND(value, 4) AS value
  FROM events WHERE event_id >= 500
)
SELECT event_type, COUNT(*)::BIGINT AS n_rows,
       SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_pre_evolution,
       ROUND(SUM(value), 4) AS total_value
FROM merged GROUP BY 1
"""


# --------------------------------------------------------------------- #
# X6: SHA-256 row hashing (reference: config hash etl/config.py:194-203)
# --------------------------------------------------------------------- #
def q_row_hash(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    payload = F.concat_ws("|", F.col("n_nationkey").cast("string"), F.col("n_name"))
    return n.select(
        "n_nationkey",
        F.sha2(payload, 256).alias("row_sha256"),
        F.md5(payload).alias("row_md5"),
    )


SQL_ROW_HASH = """
SELECT n_nationkey,
       sha256(n_nationkey::VARCHAR || '|' || n_name) AS row_sha256,
       md5(n_nationkey::VARCHAR || '|' || n_name) AS row_md5
FROM nation
"""


# --------------------------------------------------------------------- #
# date functions: date_trunc rollup over event time (the engine's
# watermark-adjacent surface; reference has only raw timestamps)
# --------------------------------------------------------------------- #
def q_daily_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


SQL_DAILY_ROLLUP = """
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------- #
# approximate aggregates — the metrics-path variants (A8 approx option).
# Sketch internals differ across engines, so these are rows-only checked
# for values; the exact-count companion column is oracle-gated above.
# --------------------------------------------------------------------- #
def q_approx_distinct(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").cast("long").alias("approx_parts"),
        F.round(F.percentile_approx("l_extendedprice", 0.5, 1000), 0).alias("approx_median_price"),
    )


QUERIES = {
    "latest_events": q_latest_events,
    "null_fill_grid": q_null_fill_grid,
    "except_all": q_except_all,
    "union_evolved": q_union_evolved,
    "row_hash": q_row_hash,
    "daily_rollup": q_daily_rollup,
    "approx_distinct": q_approx_distinct,
}

ORACLES = {
    "latest_events": SQL_LATEST_EVENTS,
    "null_fill_grid": SQL_NULL_FILL_GRID,
    "except_all": SQL_EXCEPT_ALL,
    "union_evolved": SQL_UNION_EVOLVED,
    "row_hash": SQL_ROW_HASH,
    "daily_rollup": SQL_DAILY_ROLLUP,
    # approx_distinct: rows-only (sketches differ across engines)
}
