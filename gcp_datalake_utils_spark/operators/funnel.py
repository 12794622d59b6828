"""Event-funnel conversion analysis — ordered sequential pattern
matching over the event stream (view -> click -> purchase), the
analytics op behind every conversion dashboard.

Plan shape (the scalable funnel idiom — cascading conditional-min
joins, NOT per-user event collection):

    step k frame = events of type k, equi-joined to the step k-1 frame
    on user_id, kept if ts lands in (t_{k-1}, t_{k-1} + horizon],
    min(ts) per user.

Each step shuffles only that step's event subtype keyed by user_id
(filter pushed to the scan), and per-user state is ONE timestamp —
never a collected event array, which at 100 TB would make a power-user
row arbitrarily wide. The final readout is three single-row aggregates
plus a 3-row window — driver-free.

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
    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    horizon = F.expr(f"INTERVAL {HORIZON_HOURS} HOURS")
    prev = None
    counts = []
    for i, step in enumerate(FUNNEL_STEPS):
        cur = e.where(F.col("event_type") == step)
        if prev is not None:
            cur = (cur.join(prev, "user_id")
                   .where((F.col("ts") > F.col("t_prev"))
                          & (F.col("ts") <= F.col("t_prev") + horizon)))
        stage = (cur.groupBy("user_id")
                 .agg(F.min("ts").alias("t_prev")))
        counts.append(stage.agg(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("step_name"),
            F.count("*").alias("n_users")))
        prev = stage
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first_n = F.first("n_users").over(
        Window.orderBy("step").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    prev_n = F.coalesce(
        F.lag("n_users").over(Window.orderBy("step")),
        F.col("n_users"))
    return out.select(
        "step", "step_name", "n_users",
        F.round(F.col("n_users") / prev_n, 6).alias("conv_from_prev"),
        F.round(F.col("n_users") / first_n, 6).alias("conv_from_first"))


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
