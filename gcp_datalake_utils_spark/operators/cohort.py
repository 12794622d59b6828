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
    # group on (date, int) keys; format dates only on the <=|cells|
    # result rows (date_format through DateTimeFormatter per input row
    # measured ~15% of the whole query at sf10)
    return (cells.groupBy("cohort_day",
                          F.col("day_offset").cast("long")
                          .alias("day_offset"))
            .agg(F.count("*").alias("n_users"))
            .select(F.date_format("cohort_day", "yyyy-MM-dd")
                    .alias("cohort_day"), "day_offset", "n_users"))


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


def _rfm_customer_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_utils_spark.sources import load_table
    o = load_table(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.to_date("o_orderdate")).alias("last_day"),
                     F.count("*").alias("frequency"),
                     F.sum(F.round("o_totalprice", 2)
                           .cast("decimal(18,2)")).alias("monetary")))
    ref = F.broadcast(o.agg(F.max(F.to_date("o_orderdate"))
                            .alias("ref_day")))
    return (per_cust.crossJoin(ref)
            .withColumn("recency_days",
                        F.datediff("ref_day", "last_day")))


def _rfm_rollup(scored: DataFrame) -> DataFrame:
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("long").alias("n_customers"),
                 F.sum("monetary").cast("decimal(38,6)").cast("string")
                 .alias("total_monetary"),
                 F.round(F.avg("frequency"), 6).alias("avg_frequency")))


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (r_score, f_score, m_score, n_customers, total_monetary,
    avg_frequency): quintile RFM grid over per-customer order rollups.

    Scale shape (round 9, fused boundaries): one orders scan ->
    customer-keyed partial-aggregated rollup (customer-cardinality,
    slim) -> ONE fused exact-ntile CUT-ROW computation over all three
    (R, F, M) orderings (functions/ranking.py ntile_boundaries_multi)
    -> map-side bucket assignment against the 3x4 collected boundary
    pairs (bucket_by_boundaries) -> a <=125-cell rollup. A global
    ntile window would single-partition 1e9 customers; the round-8
    chained recipe avoided that but paid THREE sequential
    repartitionByRange+collect coordination rounds AND materialized
    per-row ranks — the fusion tags branches, range-partitions the
    unioned slim projections once, collects one size table plus the
    12 boundary rows, and the customer frame itself is never
    exchanged again (r8 verdict ask #5; same-session sf10 medians
    chained 9.6 s -> fused 6.8 s at loadavg ~8, 4.6 s on a quiet
    machine; plan SinglePartition-free, guarded).
    Determinism: monetary totals are exact DECIMAL(18,2)
    sums (the _dsum rule — double sums would make the quintile ORDER
    itself partition-dependent); every branch orders (metric,
    o_custkey), DESC metrics enter negated (exact for these types in
    DECIMAL(38,6)), so ties cut identically in both engines; recency
    counts whole days between DATE casts. Quintile convention:
    score 1 = most recent / most frequent / highest spend.

    NULL-ordering contract: the order keys (recency/frequency/
    monetary) are non-null by construction on this corpus (every
    order carries a date and price). If a deployment's orders table
    had NULL dates, Spark (NULLS FIRST asc) and DuckDB (NULLS LAST)
    would cut quintiles differently — coalesce to a sentinel at the
    loader before trusting the gate on such data.

    All three metrics enter the fan as INT64: monetary as exact unit
    cents (decimal multiply then cast — never a float truncation;
    ~1e11 cents corpus-wide << 2^63), recency as NEGATED unix epoch
    days (order by days-since-ref ascending == order by last_day
    descending — the ref-day broadcast subtracts a constant, so it
    cancels out of the ORDER and is dropped entirely). Primitive
    sort keys make the fan exchange ~17 bytes/row/branch and the agg
    buffers primitive vs the decimal/crossJoin round-8 shape; cents
    re-enter decimals through an exact /100 division at the
    <=125-cell rollup."""
    from gcp_datalake_utils_spark.functions.ranking import (
        bucket_by_boundaries,
        ntile_boundaries_multi,
    )
    from gcp_datalake_utils_spark.sources import load_table
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))"
                   " * 100 AS BIGINT)")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.unix_date(F.to_date("o_orderdate")))
                     .alias("last_ud"),
                     F.count("*").alias("frequency"),
                     F.sum(cents).alias("m_cents"))
                .localCheckpoint())
    specs = [(-F.col("last_ud"), "r_score"),
             (-F.col("frequency"), "f_score"),
             (-F.col("m_cents"), "m_score")]
    cuts = ntile_boundaries_multi(per_cust, "o_custkey", specs,
                                  RFM_BINS, sv_type="long")
    scored = per_cust.select(
        "m_cents", "frequency",
        *[bucket_by_boundaries(expr.cast("long"), F.col("o_custkey"),
                               cuts[i]).cast("int").alias(out)
          for i, (expr, out) in enumerate(specs)])
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("long").alias("n_customers"),
                 F.expr("CAST(CAST(SUM(m_cents) AS DECIMAL(38,2))"
                        " / 100 AS DECIMAL(38,6))")
                 .cast("string").alias("total_monetary"),
                 F.round(F.avg("frequency"), 6).alias("avg_frequency")))


def _rfm_segments_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 chained-ntile shape, kept as the fusion's cross-check
    twin (tests/test_round9_ops.py asserts cell-for-cell equality)."""
    cust = _rfm_customer_frame(spark, sf_dir)
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
    return _rfm_rollup(scored)


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


# ---------------------------------------------------------------------------
# Daily-activity pre-aggregate (round 9, r8 verdict ask #4). The three
# cohort-family queries each re-derived per-(user, day) activity from
# raw events every run — at 100 TB that is the warehouse anti-pattern:
# behavioral rollups assume a maintained daily-activity table (the
# classic date-partitioned, user-bucketed activity fact), appended one
# day-partition at a time by the ingest pipeline (the same CDC shape
# as sources/snapshots.py incremental_agg — cost per refresh is
# |new day's events|, never |history|).
#
# The store carries everything the family needs:
#   act_user_day    (user_id, day, first_type, last_type) — one row per
#                   active (user, day); first/last are the endpoints of
#                   the day's (ts, event_id)-ordered event sequence.
#                   Bucketed by user_id (32) and sorted (user_id, day),
#                   one file per bucket: the scan reports
#                   HashPartitioning(user_id), so every per-user
#                   agg/join/window below runs with ZERO Exchange
#                   (plan-guarded). Spark 4.1 does NOT propagate the
#                   write-time sortBy order to scans (verified: even a
#                   bucket-key SMJ re-sorts), so window consumers still
#                   pay a bucket-LOCAL sort — on slim pre-agg rows, not
#                   raw events — and sort-free consumers use hash-agg +
#                   co-partitioned SHUFFLE_HASH join shapes instead.
#   act_trans_intra (from_type, to_type, n) — the fully pre-reduced
#                   WITHIN-day transition matrix, <= |event_types|^2
#                   rows. Cross-day transitions are exactly
#                   (last_type of day_i, first_type of next active
#                   day) — recoverable from act_user_day's endpoints —
#                   so the full event-bigram matrix decomposes into
#                   (tiny intra table) + (user-day-level window), and
#                   no query ever re-sorts raw events.
#
# Build runs once per (session, sf_dir) — at scale it is the table's
# write-time layout maintained per day-partition, not a query cost;
# locally the _preagg twins pay it in their discarded bench warm-up,
# identical to the bucketed-join twins (functions/scale_demos.py).
# Determinism: endpoint structs order by (ts, event_id) with event_id
# unique, so min/max structs are total-order exact in both engines.
# ---------------------------------------------------------------------------

from gcp_datalake_utils_spark.session import (SessionCache,
                                               session_key)

_DAILY_ACT = SessionCache()


def _ensure_daily_activity(spark: SparkSession, sf_dir: str) -> tuple:
    """Materialize (act_user_day, act_trans_intra) once per session;
    returns the two table names (sf_dir-suffixed so two corpora in one
    session never read each other's store). Builds are serialized
    per key (SessionCache.get_or_build), so concurrent consumers in a
    threaded host cannot race the bucketed-store write."""
    key = (session_key(spark), sf_dir)
    return _DAILY_ACT.get_or_build(
        key, lambda: _build_daily_activity(spark, sf_dir))


def _build_daily_activity(spark: SparkSession, sf_dir: str) -> tuple:
    import hashlib

    from gcp_datalake_utils_spark.sources.bucketing import write_bucketed
    from gcp_datalake_utils_spark.sources.scratch import pid_scratch
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_act, t_intra = f"act_user_day_{h}", f"act_trans_intra_{h}"
    loc = pid_scratch("/tmp/spark_graft_dailyact", sf_dir)
    e = (load_events(spark, sf_dir)
         .select("user_id", F.to_date("ts").alias("day"),
                 "ts", "event_id", "event_type"))
    ev = F.struct("ts", "event_id", "event_type")
    per_day = (e.groupBy("user_id", "day")
               .agg(F.min(ev)["event_type"].alias("first_type"),
                    F.max(ev)["event_type"].alias("last_type")))
    # repartition by the bucket key with bucket-count partitions: the
    # writer then emits exactly one file per bucket (repartition and
    # bucketBy share the murmur3 pmod), which is the condition for the
    # scan to expose its sortBy order to downstream windows
    write_bucketed(per_day.repartition(32, "user_id"),
                   t_act, "user_id", buckets=32,
                   sort_cols=["user_id", "day"], path=loc)
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    intra = (e.select(F.col("event_type").alias("from_type"),
                      F.lead("event_type").over(w).alias("to_type"))
             .where(F.col("to_type").isNotNull())
             .groupBy("from_type", "to_type")
             .agg(F.count("*").alias("n")))
    spark.sql(f"DROP TABLE IF EXISTS {t_intra}")
    (intra.coalesce(1).write.mode("overwrite")
     .option("path", f"{loc}/{t_intra}").saveAsTable(t_intra))
    return (t_act, t_intra)


def retention_cohorts_preagg(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """[Q] retention_cohorts over the maintained daily-activity store.

    Plan: bucketed scan -> bucket-LOCAL min(day)-per-user hash agg ->
    bucket-local SHUFFLE_HASH join back onto the activity rows (both
    sides carry the scan's HashPartitioning(user_id): zero Exchange,
    and unlike a min-over-user window, zero Sort — Spark 4.1 cannot
    lift the store's write-time order into the plan, so the window
    shape would re-sort every bucket) -> cell rollup (the only
    exchange, map-side partial-aggregated). The original's
    distinct-cells stage disappears entirely: store rows are unique
    per (user, day), and (cohort_day, day_offset) is a function of
    (user, day). Same oracle as retention_cohorts."""
    t_act, _ = _ensure_daily_activity(spark, sf_dir)
    a = spark.table(t_act).select("user_id", "day")
    cohorts = (a.groupBy("user_id")
               .agg(F.min("day").alias("cohort_day"))
               .hint("SHUFFLE_HASH"))
    return (a.join(cohorts, "user_id")
            .groupBy("cohort_day",
                     F.datediff("day", F.col("cohort_day"))
                     .cast("long").alias("day_offset"))
            .agg(F.count("*").alias("n_users"))
            .select(F.date_format("cohort_day", "yyyy-MM-dd")
                    .alias("cohort_day"), "day_offset", "n_users"))


def path_transitions_preagg(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """[Q] path_transitions over the daily-activity store: the tiny
    pre-reduced intra-day matrix + cross-day boundary bigrams from a
    lead-over-user window on user-day endpoint rows. The window needs
    day order, and Spark cannot reuse the store's write-time order, so
    this pays ONE bucket-local sort — but over slim 4-column user-day
    rows, never raw events, and with zero Exchange (the scan's
    HashPartitioning(user_id) satisfies the window). The only
    exchanges are <= |types|^2-row rollups. Same oracle as
    path_transitions."""
    t_act, t_intra = _ensure_daily_activity(spark, sf_dir)
    a = spark.table(t_act)
    w = Window.partitionBy("user_id").orderBy("day")
    cross = (a.select(F.col("last_type").alias("from_type"),
                      F.lead("first_type").over(w).alias("to_type"))
             .where(F.col("to_type").isNotNull())
             .groupBy("from_type", "to_type")
             .agg(F.count("*").alias("n")))
    return (cross.unionByName(spark.table(t_intra))
            .groupBy("from_type", "to_type")
            .agg(F.sum("n").cast("long").alias("n_transitions")))


def active_users_rolling7_preagg(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """[Q] active_users_rolling7 over the daily-activity store. The
    raw-events distinct (the original's first exchange) is already
    materialized; the 7x calendar fan-out explodes bucket-local rows,
    and the (user, wend) dedup runs WITHOUT an exchange — the
    broadcast-join + explode chain preserves the scan's
    HashPartitioning(user_id), which clusters (user_id, wend). Only
    the two <= n_days-row count rollups exchange. Same oracle as
    active_users_rolling7."""
    t_act, _ = _ensure_daily_activity(spark, sf_dir)
    a = spark.table(t_act).select("user_id", "day")
    dau = a.groupBy("day").agg(F.count("*").alias("dau"))
    bounds = F.broadcast(a.agg(F.max("day").alias("max_day")))
    fan = (a.crossJoin(bounds)
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


def daily_activity_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] the maintenance contract, gated the incremental_agg way:
    maintain the daily-activity state from an OLD batch (events
    strictly before the corpus max day minus 30) plus a NEW batch (the
    last 30 days) via a mergeable-state full-outer merge, and hash it
    against the oracle's FULL RECOMPUTE over all events — incremental
    must equal recompute, exactly.

    State per (user, day) is (min_ev, max_ev, n): endpoint structs
    ordered by (ts, event_id) and the event count. The merge is the
    monoid combine — least/greatest of the structs (null-skipping, so
    one-sided cells pass through) and summed counts — which is what a
    day-partitioned ingest applies when a late batch lands in an
    existing day-partition; day-aligned batches degenerate to a pure
    partition append. Both batches aggregate only their own rows:
    refresh cost is |batch|, never |history|."""
    e = (load_events(spark, sf_dir)
         .select("user_id", F.to_date("ts").alias("day"),
                 "ts", "event_id", "event_type"))
    bounds = F.broadcast(e.agg(F.date_sub(F.max("day"), 30)
                               .alias("cut")))
    e = e.crossJoin(bounds)
    ev = F.struct("ts", "event_id", "event_type")

    def state(df: DataFrame, tag: str) -> DataFrame:
        return (df.groupBy("user_id", "day")
                .agg(F.min(ev).alias(f"mn_{tag}"),
                     F.max(ev).alias(f"mx_{tag}"),
                     F.count("*").alias(f"n_{tag}")))

    old = state(e.where(F.col("day") < F.col("cut")), "o")
    new = state(e.where(F.col("day") >= F.col("cut")), "b")
    z = F.lit(0)
    return (old.join(new, ["user_id", "day"], "full_outer")
            .select("user_id",
                    F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.least("mn_o", "mn_b")["event_type"]
                    .alias("first_type"),
                    F.greatest("mx_o", "mx_b")["event_type"]
                    .alias("last_type"),
                    (F.coalesce("n_o", z) + F.coalesce("n_b", z))
                    .cast("long").alias("n_events")))


DAILY_ACTIVITY_CDC_ORACLE = """
WITH r AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         ts, event_id, event_type
  FROM events
),
w AS (
  SELECT user_id, day, event_type,
         row_number() OVER (PARTITION BY user_id, day
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, day) AS n
  FROM r
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       max(CASE WHEN rn = n THEN event_type END) AS last_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY user_id, day
"""


def active_users_rolling7_sweep(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """[Q] rolling-7 DAU/WAU by SWEEP-LINE instead of calendar fan-out:
    the structurally better 100 TB shape. The fan-out twin explodes
    every user-day into 7 window-end rows and re-deduplicates (7x rows
    through a distinct); this one observes that a user's covered
    window-ends are a UNION OF INTERVALS [day, day+6], merges
    consecutive active days with gap <= 6 into runs in ONE bucket-local
    window pass (lag+lead share one sort), and emits just two boundary
    deltas per run: (+1 at run start, -1 past min(run_end+6, max_day)).
    WAU(w) is then the running sum of per-day deltas.

    Scale audit: the only event-volume ops are the bucketed scan and
    the one bucket-local window (zero Exchange — plan-guarded); deltas
    reduce map-side to <= 2 rows/run and group to calendar-day
    cardinality. The running sum IS a single-partition window, but
    over CALENDAR DAYS — bounded by time span, not data volume (28,868
    rows here; a century of days is 36,525 rows at any corpus size) —
    the same bounded-collect class as the diagram sinks. Both boundary
    kinds come out of one select (array_compact + explode), never two
    references to the window frame (the no-CSE trap). Same oracle as
    active_users_rolling7."""
    t_act, _ = _ensure_daily_activity(spark, sf_dir)
    a = spark.table(t_act).select("user_id", "day")
    dau = a.groupBy("day").agg(F.count("*").alias("dau"))
    bounds = F.broadcast(a.agg(F.max("day").alias("max_day")))
    w = Window.partitionBy("user_id").orderBy("day")
    x = a.select(
        "day",
        F.lag("day").over(w).alias("pd"),
        F.lead("day").over(w).alias("nd"))
    is_start = F.col("pd").isNull() | (F.datediff("day", "pd") > 6)
    is_end = F.col("nd").isNull() | (F.datediff("nd", F.col("day")) > 6)
    deltas = (x.crossJoin(bounds)
              .select(F.explode(F.array_compact(F.array(
                  F.when(is_start, F.struct(
                      F.col("day").alias("day"),
                      F.lit(1).alias("d"))),
                  F.when(is_end, F.struct(
                      F.date_add(F.least(F.date_add("day", 6),
                                         F.col("max_day")), 1)
                      .alias("day"),
                      F.lit(-1).alias("d")))))).alias("e"))
              .select("e.day", "e.d"))
    # densify with the active days so the running sum is defined at
    # every day the output reports (mid-run days carry no delta)
    per_day = (deltas
               .unionByName(dau.select("day", F.lit(0).alias("d")))
               .groupBy("day").agg(F.sum("d").alias("dd")))
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0)
    wau = per_day.withColumn("wau", F.sum("dd").over(run))
    return (dau.join(wau, "day")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "dau", F.col("wau").cast("long").alias("wau"),
                    F.round(F.col("dau") / F.col("wau"), 6)
                    .alias("stickiness")))
