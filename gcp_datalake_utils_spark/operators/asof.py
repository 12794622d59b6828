"""Distributed as-of join (north-star custom operator; Spark has no
native ASOF JOIN — composed from a union timeline + window, the classic
scale-safe formulation).

Semantics: for every event, the user's most recent order at event time
(order timestamp <= event timestamp). The naive formulation — range
join then per-event max — explodes to |events| x |orders-per-user|
intermediate rows. The timeline formulation never does: union both
sides into one (user, ts) timeline, sort within user, and carry the
last seen order forward with ``last(ignorenulls)`` — one shuffle on
user_id, linear in |events| + |orders|, skew handled by AQE.

Ties: orders are first deduped to one per (user, instant) keeping the
max orderkey; at equal timestamps the order sorts BEFORE the event, so
a same-instant order is visible to the event. DuckDB's native ASOF JOIN
(e.ts >= o.ts) has the same inclusive semantics, making it the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_events, load_table


def asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] each event joined as-of to the user's latest prior order."""
    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts")
    o = (load_table(spark, sf_dir, "orders")
         .groupBy(F.col("o_custkey").alias("user_id"),
                  F.col("o_orderdate").alias("ts"))
         .agg(F.max("o_orderkey").alias("orderkey")))
    timeline = (
        o.select("user_id", "ts", F.lit(0).alias("is_event"),
                 F.lit(None).cast("long").alias("event_id"), "orderkey")
        .unionByName(
            e.select("user_id", "ts", F.lit(1).alias("is_event"),
                     "event_id",
                     F.lit(None).cast("long").alias("orderkey"))))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "is_event")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (timeline
            .withColumn("last_orderkey",
                        F.last("orderkey", ignorenulls=True).over(w))
            .where(F.col("is_event") == 1)
            .select("event_id", "user_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("event_ts"),
                    "last_orderkey"))


ASOF_LAST_ORDER_ORACLE = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate AS ots,
         max(o_orderkey) AS orderkey
  FROM orders GROUP BY 1, 2
),
e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets FROM events
)
SELECT e.event_id, e.user_id,
       strftime(e.ets, '%Y-%m-%d %H:%M:%S') AS event_ts,
       o.orderkey AS last_orderkey
FROM e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ets >= o.ots
"""
