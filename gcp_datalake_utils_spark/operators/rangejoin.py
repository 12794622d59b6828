"""Banded (grid-bucketed) range join — interval containment at scale.

Spark has no native range-join operator: a plain ``ON t BETWEEN ws AND
we`` join plans as BroadcastNestedLoopJoin (small side) or a cartesian
product (both large) — O(|events|·|windows|) and a non-starter at
100 TB. The scale-correct pattern, used here, is time-grid banding:

1. pick a band width B (here 6 h);
2. explode each window into the grid cells its [ws, we) span covers
   (``sequence(floor(ws/B), floor((we-1µs)/B))`` — tiny: span/B rows
   per window);
3. map each event to its single cell ``floor(ts/B)``;
4. equi-join on the cell (hash join, shuffle bounded by data size,
   AQE-skew-splittable) and apply the exact ``ws <= ts < we`` residual.

Candidates are only (event, window) pairs sharing a cell, so the join
cost tracks data volume × windows-per-cell, not the full cross
product. Each event lands in exactly one cell and window cells are
distinct, so no post-join dedup is needed.

This generalizes the as-of join / session-window family (SURVEY §2
ext): the reference's audit-window scan (``restore_dataset.sh``
time-window discovery) is the 1-window special case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_events

BAND_SECONDS = 6 * 3600
_BAND_US = BAND_SECONDS * 1_000_000


def _cell(ts_sql: str) -> Column:
    # true integer floor-division of epoch micros (SQL `div`, not `/`):
    # long `/` in Spark is double division and epoch-2024 micros exceed
    # 2^53, so the quotient would round (ulp ~256 us) and cells near
    # band boundaries could land one off from the exact floor
    return F.expr(f"unix_micros({ts_sql}) div {_BAND_US}L")


def banded_range_join(events: DataFrame, windows: DataFrame,
                      ts_col: str = "ts", ws_col: str = "ws",
                      we_col: str = "we") -> DataFrame:
    """Inner-join ``events`` to every window whose [ws, we) contains
    its ``ts_col``, via grid cells instead of a nested-loop predicate.
    ``windows`` keeps all its other columns as window identity."""
    w_cells = windows.withColumn(
        "_cell",
        F.explode(F.sequence(
            _cell(ws_col),
            F.expr(f"(unix_micros({we_col}) - 1) div {_BAND_US}L"))))
    e_cells = events.withColumn("_cell", _cell(ts_col))
    return (e_cells.join(w_cells, "_cell")
            .where((F.col(ts_col) >= F.col(ws_col))
                   & (F.col(ts_col) < F.col(we_col)))
            .drop("_cell"))


def events_in_type_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] range join: per event_type, the 36-hour window opening at
    that type's first event; count ALL events (any type) falling in
    each window. Windows overlap heavily — the banded join handles
    overlapping intervals by construction."""
    e = load_events(spark, sf_dir)
    windows = (e.groupBy(F.col("event_type").alias("window_type"))
               .agg(F.min("ts").alias("ws"))
               .withColumn("we", F.col("ws")
                           + F.expr("INTERVAL 36 HOURS")))
    joined = banded_range_join(e.select("ts", "value"), windows)
    return (joined.groupBy("window_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value")))


EVENTS_IN_TYPE_WINDOWS_ORACLE = """
WITH w AS (
  SELECT event_type AS window_type,
         min(CAST(ts AS TIMESTAMP)) AS ws,
         min(CAST(ts AS TIMESTAMP)) + INTERVAL 36 HOUR AS we
  FROM events GROUP BY event_type
)
SELECT w.window_type, count(*) AS n_events,
       round(sum(e.value), 6) AS total_value
FROM w JOIN events e
  ON CAST(e.ts AS TIMESTAMP) >= w.ws AND CAST(e.ts AS TIMESTAMP) < w.we
GROUP BY w.window_type
"""
