"""Pivot / crosstab: long event stream -> wide per-day type matrix.

The reporting shape every catalog/BI consumer asks for. Spark's
``groupBy().pivot(col, values).count()`` with an EXPLICIT value list
plans a single pass: one partial-aggregated shuffle on the grouping
key with the pivot columns as conditional aggregates — identical cost
to the long-form groupBy. Omitting the value list would trigger a
driver-side distinct job first (two scans) and make the output schema
data-dependent; at 100 TB the explicit list is the only sane form
(and the schema contract downstream jobs compile against).

Oracle: the equivalent CASE-sum matrix (DuckDB's PIVOT would infer
columns dynamically — same reason to avoid it in the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources.registry import load_events

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] per-day wide event counts: (day, n_click, n_error,
    n_purchase, n_signup, n_view, n_total)."""
    e = load_events(spark, sf_dir)
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    wide = (e.groupBy(day.alias("day"))
            .pivot("event_type", EVENT_TYPES)
            .count())
    cols = [F.coalesce(F.col(t), F.lit(0)).cast("long")
            .alias(f"n_{t}") for t in EVENT_TYPES]
    total = sum(F.coalesce(F.col(t), F.lit(0)) for t in EVENT_TYPES) \
        .cast("long").alias("n_total")
    return wide.select("day", *cols, total)


EVENTS_PIVOT_ORACLE = f"""
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d') AS day,
       {', '.join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
           f"AS BIGINT) AS n_{t}" for t in EVENT_TYPES)},
       CAST(sum(CASE WHEN event_type IN
                ({', '.join(repr(t) for t in EVENT_TYPES)})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_total
FROM events
GROUP BY 1
"""
