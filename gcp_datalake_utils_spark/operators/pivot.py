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


# --- time-range rolling aggregates (RANGE frame) ------------------------


def events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] 7-day trailing window per event type: for each (type, day)
    with activity, the total events and value over days [d-6, d] — a
    RANGE frame over day numbers, so gaps in the calendar are handled
    by VALUE distance, not row offsets (a rowsBetween frame would
    silently shrink the window across quiet days).

    Scale shape: daily pre-aggregation first (the corpus collapses to
    |types| x |days| rows map-side), THEN the rolling window over the
    tiny daily frame — never a per-event window. The window shuffle
    carries days, not events."""
    e = load_events(spark, sf_dir)
    day_num = F.floor(
        F.unix_micros(F.date_trunc("day", "ts")) / F.lit(86_400_000_000))
    daily = (e.groupBy("event_type", day_num.alias("day_num"))
             .agg(F.count("*").alias("n"),
                  F.sum(F.round("value", 6)
                        .cast("decimal(18,6)")).alias("v")))
    from pyspark.sql import Window
    w = (Window.partitionBy("event_type").orderBy("day_num")
         .rangeBetween(-6, 0))
    return (daily.select(
        "event_type",
        F.col("day_num").cast("long").alias("day_num"),
        F.col("n").alias("n_day"),
        F.sum("n").over(w).cast("long").alias("n_7d"),
        F.round(F.sum("v").over(w).cast("double"), 6).alias("v_7d")))


EVENTS_ROLLING_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
                    / 86400000000.0) AS BIGINT) AS day_num,
         count(*) AS n,
         sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS v
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, day_num, n AS n_day,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day_num
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_7d,
       round(CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day_num
                               RANGE BETWEEN 6 PRECEDING
                               AND CURRENT ROW) AS DOUBLE), 6) AS v_7d
FROM daily
"""


# --- calendar gap-fill (dense time series from a sparse event log) -----


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] dense hourly series per event type: every hour in the
    type's [first, last] activity range appears, quiet hours as 0 —
    the densification step before any rolling/forecast consumer
    (a sparse left side would silently skip empty buckets).

    Spark-first shape: per-type min/max hour (one tiny agg) ->
    ``sequence()`` generates each type's hour range in-row ->
    ``explode`` -> LEFT join the observed hourly counts back. The
    generated side is |types| x |hours| rows (calendar-sized, not
    event-sized); the only event-sized work is the hourly pre-agg.
    At 100 TB the join is a broadcast of the observed counts per
    type-hour if small, else a hash join on (type, hour) — both
    linear."""
    e = load_events(spark, sf_dir)
    hour_num = F.floor(
        F.unix_micros(F.date_trunc("hour", "ts"))
        / F.lit(3_600_000_000))
    hourly = (e.groupBy("event_type", hour_num.alias("hour_num"))
              .agg(F.count("*").alias("n")))
    spans = (hourly.groupBy("event_type")
             .agg(F.min("hour_num").alias("h0"),
                  F.max("hour_num").alias("h1")))
    dense = (spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1")).alias("hour_num")))
    return (dense.join(hourly, ["event_type", "hour_num"], "left")
            .select("event_type",
                    F.col("hour_num").cast("long").alias("hour_num"),
                    F.coalesce("n", F.lit(0)).cast("long").alias("n")))


EVENTS_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                    / 3600000000.0) AS BIGINT) AS hour_num,
         count(*) AS n
  FROM events
  GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(hour_num) AS h0, max(hour_num) AS h1
  FROM hourly GROUP BY event_type
),
dense AS (
  SELECT s.event_type, CAST(t.h AS BIGINT) AS hour_num
  FROM spans s, unnest(generate_series(s.h0, s.h1)) AS t(h)
)
SELECT d.event_type, d.hour_num,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n
FROM dense d
LEFT JOIN hourly h
  ON d.event_type = h.event_type AND d.hour_num = h.hour_num
"""
