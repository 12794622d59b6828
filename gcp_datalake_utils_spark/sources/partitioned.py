"""Hive-partitioned parquet sink + pruned reads.

The reference's export path materializes query results into date-sharded
BigQuery tables; the Spark-native equivalent is a parquet sink
``partitionBy``-ed on the query's dominant filter column, so later scans
prune whole directories before any file is opened.

At 100 TB this is the difference between reading one day (~0.3%) and
reading the whole lake: the `PartitionFilters` entry in the scan node —
guarded by `tests/test_plans.py` — proves pruning happens at planning
time, not per-row.

``repartition(partition_cols)`` before the write keeps one task per
(shuffle partition × date) from writing hundreds of tiny files — the
classic small-files failure of naive ``partitionBy`` at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources.registry import load_events


def write_events_by_date(spark: SparkSession, sf_dir: str,
                         out_path: str) -> None:
    """Sink events as parquet partitioned by event date (one directory
    per day, co-writing each day from a single shuffle partition)."""
    ev = load_events(spark, sf_dir).withColumn(
        "event_date", F.to_date("ts"))
    (ev.repartition("event_date")
     .write.mode("overwrite")
     .partitionBy("event_date")
     .parquet(out_path))


def read_events_for_date(spark: SparkSession, out_path: str,
                         day: str) -> DataFrame:
    """Scan exactly one day's partition: the `event_date = day` filter
    is a partition filter, so non-matching directories are never read."""
    return (spark.read.parquet(out_path)
            .where(F.col("event_date") == F.lit(day).cast("date")))


# ---------------------------------------------------------------------------
# Dynamic partition pruning (round 9). Static pruning above covers the
# "filter is a literal" case; the other half of the 100 TB story is a
# partition filter that only EXISTS at runtime — "the months some
# dimension query selects" — where Catalyst plants a dynamicpruning
# subquery on the partitioned scan and skips every non-matching
# directory without a literal in sight. The store is month-partitioned
# (this corpus's day cardinality would hit the classic small-files
# wall: 29k day dirs at sf10 vs ~960 months).
# ---------------------------------------------------------------------------

_MONTH_STORE: dict[tuple, str] = {}
AUDIT_EVERY = 100_000  # every 100k-th event_id is an audit marker


def _ensure_events_by_month(spark: SparkSession, sf_dir: str) -> str:
    """Write the month-partitioned events store once per session
    (pid-scoped path; in production this is the table's layout)."""
    key = (id(spark), sf_dir)
    if key in _MONTH_STORE:
        return _MONTH_STORE[key]
    from gcp_datalake_utils_spark.sources.scratch import pid_scratch
    loc = pid_scratch("/tmp/spark_graft_evmonth", sf_dir)
    ev = load_events(spark, sf_dir).withColumn(
        "event_month", F.date_format("ts", "yyyy-MM"))
    (ev.repartition("event_month")
     .write.mode("overwrite")
     .partitionBy("event_month")
     .parquet(loc))
    _MONTH_STORE[key] = loc
    return loc


def events_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (event_month, event_type, n_events, total_value): event
    rollup restricted to the months containing an audit-marker event
    (event_id divisible by AUDIT_EVERY — the S9 audit-log flavor at
    partition granularity). The month set is a runtime query result,
    so the filter reaches the partitioned scan as a DYNAMIC pruning
    subquery (the selective marker Filter is what Spark's
    PartitionPruning rule keys on — an agg/limit dim carries no
    Filter node and gets NO DPP, measured), never as a per-row
    post-scan predicate. At 100 TB that is the difference between
    scanning the flagged months and scanning the lake because the hot
    set wasn't known at plan time. Plan evidence: `dynamicpruning`
    inside the store scan's PartitionFilters
    (tests/test_round9_ops.py); at sf10 the dim keeps 100 of 987
    months."""
    loc = _ensure_events_by_month(spark, sf_dir)
    store = spark.read.parquet(loc)
    dim = (load_events(spark, sf_dir)
           .where(F.col("event_id") % AUDIT_EVERY == 0)
           .select(F.date_format("ts", "yyyy-MM").alias("hm"))
           .distinct())
    return (store.join(F.broadcast(dim),
                       store["event_month"] == dim["hm"])
            .groupBy("event_month", "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.round("value", 2).cast("decimal(18,2)"))
                 .cast("decimal(38,6)").cast("string")
                 .alias("total_value")))


EVENTS_DPP_JOIN_ORACLE = f"""
WITH e AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS event_month,
         event_type, value, event_id
  FROM events
),
dim AS (
  SELECT DISTINCT event_month AS hm
  FROM e WHERE event_id % {AUDIT_EVERY} = 0
)
SELECT event_month, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2)))
            AS DECIMAL(38,6)) AS VARCHAR) AS total_value
FROM e JOIN dim ON e.event_month = dim.hm
GROUP BY event_month, event_type
"""
