"""Slowly-changing-dimension (type 2) history builder.

Warehouse maintenance surface adjacent to the reference's snapshot /
restore tooling (restore_dataset.sh rebuilds point-in-time copies;
bigquery-to-erd models dimension tables): given a change feed keyed by a
business key and ordered by change time, emit effective-dated version
rows — ``valid_from`` / ``valid_to`` half-open intervals, a version
ordinal and an ``is_current`` flag — the standard SCD2 layout consumed
by as-of joins (see ``operators/asof.py`` for the read side).

Scale shape: ONE hash shuffle on the business key, then two window
functions (``lead`` + ``row_number``) over the same
(key, change_ts, tiebreak) sort — Spark plans a single Sort + Window
pair, no second exchange. Linear in the feed; skewed keys are bounded by
per-key history length, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] effective-dated order-status history per customer.

    Treats each order as a change record for the customer's "latest
    status" attribute: (custkey, orderkey, status, valid_from,
    valid_to, version, is_current) where valid_to is the next change's
    date (NULL while current) and version counts changes per customer.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    day = "yyyy-MM-dd"
    return (o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", day).alias("valid_from"),
        F.date_format(F.lead("o_orderdate").over(w), day)
         .alias("valid_to"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    ))


SCD2_HISTORY_ORACLE = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       o_orderstatus AS status,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
       CAST(row_number() OVER w AS INTEGER) AS version,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""
