"""Second relational battery: the remaining SURVEY.md §2 rows —
recency-limited date rollups (T3), null handling (F7), and set ops /
additive-evolution union (§2.7).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gene_etl_spark.queries.relational import load


# --------------------------------------------------------------------- #
# T3 + date rollup: date_trunc day/type rollup with a recency limit —
# the latest 100 rollup rows (reference: latest-100 validation rows,
# app.py:404; the engine's watermark-adjacent batch surface). The limit
# plans as TakeOrderedAndProject over the agg, never a global sort.
# (Merged from the round-2 `latest_events` + `daily_rollup` twins to
# keep the registry inside the driver's 50-query gate.)
# --------------------------------------------------------------------- #
def q_recent_daily_rollup(spark, sf_dir):
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
        .orderBy(F.desc("day"), F.asc("event_type"))
        .limit(100)
    )


SQL_RECENT_DAILY_ROLLUP = """
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2
ORDER BY day DESC, event_type ASC LIMIT 100
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


# NOTE (round 3): the former `row_hash` entry (X6 sha256/md5 projection)
# was retired from the gated registry to fit the driver's 50-query cap —
# cross-engine md5 hashing remains value-gated through every textops
# fingerprint query, and the X6 config-hash path is test-covered
# (gene_etl_spark/config.py). `approx_distinct` merged into the gated
# `count_distinct` entry (exact counts + bounded-relative-error flag).

# --------------------------------------------------------------------- #
# Temporal as-of join, driver-gated (round-5 verdict item 2): every
# purchase event decorated with the latest click at-or-before it per
# user. Spark side is operators/temporal.py's union-and-window form
# (ONE hash shuffle on user_id — never Catalyst's nested-loop on the
# inequality); the DuckDB twin is the native ASOF JOIN. The right side
# is pre-deduped to unique (user_id, ts) — equal-time right duplicates
# are documented caller-dedup territory on both engines.
# --------------------------------------------------------------------- #
def q_asof_temporal(spark, sf_dir):
    from gene_etl_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    right = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("click_value"))
    )
    j = asof_join(left, right, on="ts", by="user_id", direction="backward")
    return j.select(
        "event_id",
        "user_id",
        "purchase_value",
        "click_value",
        F.col("__asof_t_right").alias("click_ts"),
    )


SQL_ASOF_TEMPORAL = """
WITH l AS (
  SELECT event_id, user_id, ts, ROUND(value, 4) AS purchase_value
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, ROUND(MAX(value), 4) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.purchase_value,
       r.click_value AS click_value, r.ts AS click_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


QUERIES = {
    "recent_daily_rollup": q_recent_daily_rollup,
    "null_fill_grid": q_null_fill_grid,
    "union_evolved": q_union_evolved,
    "asof_temporal": q_asof_temporal,
}

ORACLES = {
    "recent_daily_rollup": SQL_RECENT_DAILY_ROLLUP,
    "null_fill_grid": SQL_NULL_FILL_GRID,
    "union_evolved": SQL_UNION_EVOLVED,
    "asof_temporal": SQL_ASOF_TEMPORAL,
}
