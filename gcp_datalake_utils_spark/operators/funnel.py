"""Event-funnel conversion analysis — ordered sequential pattern
matching over the event stream (view -> click -> purchase), the
analytics op behind every conversion dashboard.

Plan shape (round 7 rework — single-shuffle conditional-min window
cascade, NOT per-user event collection and NOT per-step joins):

    one scan (event_type IN steps pushed to parquet) -> ONE Exchange
    on user_id -> one local sort -> k chained Window nodes, each
    computing t_k = min(ts WHERE type = step_k AND t_{k-1} < ts <=
    t_{k-1} + horizon) over the user partition -> per-user dedup
    (HashAggregate, no new Exchange: already user-partitioned) ->
    one global 1-row count aggregate -> 3-row explode.

The r4 shape joined each step's frame back to the previous stage
(3 scans of events + 2 join shuffles + 3 aggregation branches); at
sf10 that measured 8.5 s vs 0.27 s DuckDB. The cascade shuffles the
event table ONCE, and each subsequent window reuses the partitioning
and ordering (zero extra Exchange/Sort — plan-guarded). Per-user
state is still k timestamps, never a collected event array, so a
power user cannot make a row arbitrarily wide at 100 TB.

Semantics: earliest qualifying chain (first view, then the first click
within the horizon after it, then the first purchase within the
horizon after that click). This greedy chain is the standard funnel
definition; it can differ from "exists any chain" when a later view
would enable a chain the earliest one misses — a documented trade made
by every warehouse funnel implementation that avoids per-user
backtracking.

Reference parity: the reference has no event funnel (its closest scan
is the audit-log window list, main.py audit queries); this is part of
the analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_events

FUNNEL_STEPS = ["view", "click", "purchase"]
HORIZON_HOURS = 72


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (step, step_name, n_users, conv_from_prev, conv_from_first)
    for the view->click->purchase funnel with a 72 h per-step horizon."""
    e = (load_events(spark, sf_dir)
         .select("user_id", "event_type", "ts")
         .where(F.col("event_type").isin(FUNNEL_STEPS)))
    horizon = F.expr(f"INTERVAL {HORIZON_HOURS} HOURS")
    w = Window.partitionBy("user_id")
    df = e
    for i, step in enumerate(FUNNEL_STEPS):
        cond = F.col("event_type") == step
        if i > 0:
            t_prev = F.col(f"t{i}")
            cond = (cond & (F.col("ts") > t_prev)
                    & (F.col("ts") <= t_prev + horizon))
        df = df.withColumn(
            f"t{i + 1}", F.min(F.when(cond, F.col("ts"))).over(w))
    # one row per user (HashAggregate on the existing user_id
    # partitioning — no new Exchange), then ONE 1-row global count
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"t{i + 1}").alias(f"t{i + 1}")
          for i in range(len(FUNNEL_STEPS))])
    counts = per_user.agg(
        *[F.count(f"t{i + 1}").alias(f"n{i + 1}")
          for i in range(len(FUNNEL_STEPS))])
    rows = []
    for i, step in enumerate(FUNNEL_STEPS):
        n, prev_n, first_n = (F.col(f"n{i + 1}").cast("long"),
                              F.col(f"n{max(i, 1)}"), F.col("n1"))
        rows.append(F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("step_name"),
            n.alias("n_users"),
            F.round(n / prev_n, 6).alias("conv_from_prev"),
            F.round(n / first_n, 6).alias("conv_from_first")))
    return (counts.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def _steps_sql() -> str:
    ctes = []
    prev = None
    for i, step in enumerate(FUNNEL_STEPS):
        name = f"s{i + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t_prev FROM e "
                f"WHERE event_type = '{step}' GROUP BY user_id)")
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t_prev "
                f"FROM e JOIN {prev} p USING (user_id) "
                f"WHERE e.event_type = '{step}' AND e.ts > p.t_prev "
                f"AND e.ts <= p.t_prev + INTERVAL {HORIZON_HOURS} HOUR "
                f"GROUP BY e.user_id)")
        prev = name
    return ",\n".join(ctes)


_COUNTS_SQL = " UNION ALL ".join(
    f"SELECT {i + 1} AS step, '{s}' AS step_name, "
    f"CAST((SELECT count(*) FROM s{i + 1}) AS BIGINT) AS n_users"
    for i, s in enumerate(FUNNEL_STEPS))

FUNNEL_CONVERSION_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
{_steps_sql()},
counts AS ({_COUNTS_SQL})
SELECT step, step_name, n_users,
       round(n_users / CAST(coalesce(
         lag(n_users) OVER (ORDER BY step), n_users) AS DOUBLE), 6)
         AS conv_from_prev,
       round(n_users / CAST(first_value(n_users)
         OVER (ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING AND
               UNBOUNDED FOLLOWING) AS DOUBLE), 6) AS conv_from_first
FROM counts
"""
