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
