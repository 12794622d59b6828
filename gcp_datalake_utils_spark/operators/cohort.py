"""Behavioral event analytics: retention cohorts and path transitions
(north-star extension; generalizes the reference's audit-log window
scans — SURVEY §2 S9/I5 — from "which tables changed when" to the
user-behavior rollups every product analytics stack runs).

Both operators are single-pass window + aggregate plans over the
events table:

- retention_cohorts: the classic cohort triangle. A user's cohort is
  their first active day (min-over-user window); every (user, day)
  activity becomes a (cohort_day, day_offset) cell counting distinct
  users. At 100 TB the only wide ops are the user-keyed window and the
  cell-keyed count-distinct — both partial-aggregated, no join (the
  min-over-window replaces the groupBy-then-join-back shape, saving an
  exchange and a join).
- path_transitions: the event-type transition matrix. Per user, order
  events by (ts, event_id) — event_id breaks timestamp ties so the
  sequence (and therefore the oracle comparison) is deterministic —
  and count consecutive (from_type, to_type) bigrams via ONE lead()
  window. The classic self-join-on-rank formulation shuffles the
  events table twice; lead() shuffles once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_events


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] cohort triangle: (cohort_day, day_offset, n_users) — of the
    users first seen on cohort_day, how many were active again
    day_offset days later."""
    e = load_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day"))
    cohort = F.min("day").over(Window.partitionBy("user_id"))
    cells = (e.withColumn("cohort_day", cohort)
             .select("user_id", "cohort_day",
                     F.datediff("day", "cohort_day").alias("day_offset"))
             .distinct())
    return (cells.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count("*").alias("n_users")))


RETENTION_COHORTS_ORACLE = """
WITH peru AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
wc AS (
  SELECT user_id, day,
         min(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM peru
),
cells AS (
  SELECT DISTINCT user_id, cohort_day,
         date_diff('day', cohort_day, day) AS day_offset
  FROM wc
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM cells GROUP BY 1, 2
"""


def path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] event-type transition matrix: (from_type, to_type,
    n_transitions) over each user's (ts, event_id)-ordered stream."""
    e = load_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    return (e.select(F.col("event_type").alias("from_type"),
                     nxt.alias("to_type"))
            .where(F.col("to_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count("*").alias("n_transitions")))


PATH_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE to_type IS NOT NULL
GROUP BY 1, 2
"""


def active_users_rolling7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] DAU / trailing-7-day WAU / stickiness per day. Exact sliding
    DISTINCT counts do not decompose into partial aggregates, so the
    scale shape is a bounded calendar FAN-OUT: each distinct
    (user, active_day) row contributes to the 7 window-end days it
    falls inside, then one distinct + count per window end. The fan-out
    is a constant 7x on the deduplicated activity rows (NOT on raw
    events), every stage is a partial-aggregated hash exchange, and no
    window function orders the whole table. Days with no activity in
    range simply have no row; window ends past the observed range are
    clipped against the broadcast max-day bound (window starts need no
    clip — an early end simply finds fewer contributing days)."""
    e = (load_events(spark, sf_dir)
         .select("user_id", F.to_date("ts").alias("day")).distinct())
    dau = e.groupBy("day").agg(F.count("*").alias("dau"))
    bounds = F.broadcast(e.agg(F.max("day").alias("max_day")))
    fan = (e.crossJoin(bounds)
           .select("user_id",
                   F.explode(F.sequence(
                       "day", F.least(F.date_add("day", 6),
                                      F.col("max_day"))))
                   .alias("wend"))
           .distinct())
    wau = fan.groupBy("wend").agg(F.count("*").alias("wau"))
    return (dau.join(wau, dau.day == wau.wend)
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "dau", "wau",
                    F.round(F.col("dau") / F.col("wau"), 6)
                    .alias("stickiness")))


ACTIVE_USERS_ROLLING7_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
dau AS (SELECT day, count(*) AS dau FROM act GROUP BY day),
bounds AS (SELECT max(day) AS max_day FROM act),
fan AS (
  SELECT DISTINCT user_id, wend
  FROM act, bounds,
       UNNEST(generate_series(day, least(day + 6, max_day),
                              INTERVAL 1 DAY)) AS t(wend)
),
wau AS (SELECT CAST(wend AS DATE) AS wend, count(*) AS wau
        FROM fan GROUP BY 1)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       round(d.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM dau d JOIN wau w ON w.wend = d.day
"""


# ---------------------------------------------------------------------------
# RFM segmentation (round 8). The classic customer-value grid over the
# orders fact: recency (days since last order, vs the corpus max
# date), frequency (order count), monetary (exact decimal spend), each
# cut into quintiles. Complements the event-side cohort family with
# the transaction-side rollup every growth/CRM stack runs.
# ---------------------------------------------------------------------------

RFM_BINS = 5

def _distributed_ntile(df, order_exprs, out, bins, **kw):
    """Shared recipe — see functions/ranking.py."""
    from gcp_datalake_utils_spark.functions.ranking import (
        distributed_ntile,
    )
    return distributed_ntile(df, order_exprs, out, bins, **kw)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (r_score, f_score, m_score, n_customers, total_monetary,
    avg_frequency): quintile RFM grid over per-customer order rollups.

    Scale shape: one orders scan -> customer-keyed partial-aggregated
    rollup (customer-cardinality, slim) -> three DISTRIBUTED exact
    ntiles over that frame (see _distributed_ntile — a global ntile
    window would single-partition 1e9 customers; measured 9.7 -> 6.6 s
    at sf10 on 1.5M customers, and the plan carries no SinglePartition
    exchange, plan-guarded) -> a <=125-cell rollup. The residual vs
    DuckDB's 1.4 s single-node sort is the three checkpoint+collect
    coordination rounds — the price of the shape that scales.
    Determinism:
    monetary totals are exact DECIMAL(18,2) sums (the _dsum rule —
    double sums would make the quintile ORDER itself partition-
    dependent); every ntile orders (metric, o_custkey) so ties cut
    identically in both engines; recency counts whole days between
    DATE casts. Quintile convention: score 1 = most recent / most
    frequent / highest spend.

    NULL-ordering contract: the order keys (recency/frequency/
    monetary) are non-null by construction on this corpus (every
    order carries a date and price). If a deployment's orders table
    had NULL dates, Spark (NULLS FIRST asc) and DuckDB (NULLS LAST)
    would cut quintiles differently — coalesce to a sentinel at the
    loader before trusting the gate on such data."""
    from gcp_datalake_utils_spark.sources import load_table
    o = load_table(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.to_date("o_orderdate")).alias("last_day"),
                     F.count("*").alias("frequency"),
                     F.sum(F.round("o_totalprice", 2)
                           .cast("decimal(18,2)")).alias("monetary")))
    ref = F.broadcast(o.agg(F.max(F.to_date("o_orderdate"))
                            .alias("ref_day")))
    cust = (per_cust.crossJoin(ref)
            .withColumn("recency_days",
                        F.datediff("ref_day", "last_day")))
    scored = _distributed_ntile(
        cust, [F.col("recency_days"), F.col("o_custkey")],
        "r_score", RFM_BINS)
    # the 2nd/3rd ntiles read the previous call's checkpointed output
    scored = _distributed_ntile(
        scored, [F.desc("frequency"), F.col("o_custkey")],
        "f_score", RFM_BINS, checkpoint_input=False)
    scored = _distributed_ntile(
        scored, [F.desc("monetary"), F.col("o_custkey")],
        "m_score", RFM_BINS, checkpoint_input=False)
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("long").alias("n_customers"),
                 F.sum("monetary").cast("decimal(38,6)").cast("string")
                 .alias("total_monetary"),
                 F.round(F.avg("frequency"), 6).alias("avg_frequency")))


RFM_SEGMENTS_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_day,
         count(*) AS frequency,
         sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
           AS monetary
  FROM orders GROUP BY o_custkey
),
ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
scored AS (
  SELECT o_custkey, frequency, monetary,
         CAST(ntile({RFM_BINS}) OVER (
           ORDER BY date_diff('day', last_day, ref_day), o_custkey)
           AS INTEGER) AS r_score,
         CAST(ntile({RFM_BINS}) OVER (
           ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f_score,
         CAST(ntile({RFM_BINS}) OVER (
           ORDER BY monetary DESC, o_custkey) AS INTEGER) AS m_score
  FROM per_cust, ref
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(CAST(sum(monetary) AS DECIMAL(38,6)) AS VARCHAR)
         AS total_monetary,
       round(avg(frequency), 6) AS avg_frequency
FROM scored GROUP BY r_score, f_score, m_score
"""
