"""Distribution-drift monitoring: Population Stability Index between
two time windows of the event stream — the standard production check
that a feature's distribution hasn't shifted between a reference
period and now.

PSI = sum_i (p_i - q_i) * ln(p_i / q_i) over fixed-width value bins,
with Laplace (+1) smoothing so empty bins stay finite. Everything that
feeds the float math is INTEGER (bin counts, totals), bin edges are
literals, and the per-type term sum runs as an ordered fold over the
bin-sorted term array (collect_list -> array_sort -> F.aggregate,
mirrored by DuckDB's list(... ORDER BY bin) + list_reduce) — the same
sequential-addition contract as vocab_entropy, so both engines add
identical doubles in identical order.

Scale shape: one events scan, one (type, bin)-keyed partial-aggregated
rollup (state bounded by types x bins), a broadcast grid join to
materialize empty bins, and a types-sized fold. Nothing grows with
stream length except the first scan.

Interpretation thresholds (industry convention, in the docstring for
the readout's consumers): PSI < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 action needed.

Reference parity: the reference's data tests compare distributions by
top-k value overlap (data_test.py distribution checks); PSI is this
repo's scale-robust extension of the same intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_events

DRIFT_SPLIT = "2024-01-16 00:00:00"  # reference window | current window
DRIFT_BINS = 20
DRIFT_BIN_WIDTH = 25.0  # value in [0, 500) -> 20 fixed bins, clamped


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (event_type, ref_n, cur_n, psi): PSI of the value
    distribution, reference window (ts < split) vs current."""
    e = load_events(spark, sf_dir).select("event_type", "ts", "value")
    b = F.least(
        F.greatest(F.floor(F.col("value") / DRIFT_BIN_WIDTH)
                   .cast("int"), F.lit(0)),
        F.lit(DRIFT_BINS - 1))
    split = F.to_timestamp(F.lit(DRIFT_SPLIT))
    counted = (e.groupBy("event_type", b.alias("bin"))
               .agg(F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
                    .alias("ref_c"),
                    F.sum(F.when(F.col("ts") >= split, 1).otherwise(0))
                    .alias("cur_c")))
    types = e.select("event_type").distinct()
    grid = (spark.range(DRIFT_BINS)
            .select(F.col("id").cast("int").alias("bin"))
            .crossJoin(F.broadcast(types)))
    filled = (grid.join(counted, ["event_type", "bin"], "left")
              .select("event_type", "bin",
                      F.coalesce("ref_c", F.lit(0)).alias("ref_c"),
                      F.coalesce("cur_c", F.lit(0)).alias("cur_c")))
    tot = (filled.groupBy("event_type")
           .agg(F.sum("ref_c").alias("ref_n"),
                F.sum("cur_c").alias("cur_n")))
    p = (F.col("ref_c") + 1) / (F.col("ref_n") + DRIFT_BINS)
    q = (F.col("cur_c") + 1) / (F.col("cur_n") + DRIFT_BINS)
    term = (p - q) * F.log(p / q)
    rows = (filled.join(F.broadcast(tot), "event_type")
            .select("event_type", "ref_n", "cur_n", "bin",
                    term.alias("term")))
    folded = (rows.groupBy("event_type", "ref_n", "cur_n")
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(F.struct("bin", "term"))),
                  F.lit(0.0), lambda a, s: a + s["term"])
                  .alias("psi_raw")))
    return folded.select("event_type", "ref_n", "cur_n",
                         F.round("psi_raw", 6).alias("psi"))


_P_SQL = f"((f.ref_c + 1) / CAST(t.ref_n + {DRIFT_BINS} AS DOUBLE))"
_Q_SQL = f"((f.cur_c + 1) / CAST(t.cur_n + {DRIFT_BINS} AS DOUBLE))"

VALUE_DRIFT_PSI_ORACLE = f"""
WITH e AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
binned AS (
  SELECT event_type,
         least(greatest(CAST(floor(value / {DRIFT_BIN_WIDTH})
                             AS INTEGER), 0), {DRIFT_BINS - 1}) AS bin,
         CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END
           AS is_ref
  FROM e
),
counted AS (
  SELECT event_type, bin,
         CAST(sum(is_ref) AS BIGINT) AS ref_c,
         CAST(sum(1 - is_ref) AS BIGINT) AS cur_c
  FROM binned GROUP BY event_type, bin
),
grid AS (
  SELECT g.event_type, CAST(t.bin AS INTEGER) AS bin
  FROM (SELECT unnest(range({DRIFT_BINS})) AS bin) t
  CROSS JOIN (SELECT DISTINCT event_type FROM events) g
),
filled AS (
  SELECT g.event_type, g.bin,
         coalesce(c.ref_c, 0) AS ref_c, coalesce(c.cur_c, 0) AS cur_c
  FROM grid g LEFT JOIN counted c
    ON c.event_type = g.event_type AND c.bin = g.bin
),
tot AS (
  SELECT event_type, CAST(sum(ref_c) AS BIGINT) AS ref_n,
         CAST(sum(cur_c) AS BIGINT) AS cur_n
  FROM filled GROUP BY event_type
),
terms AS (
  SELECT f.event_type, t.ref_n, t.cur_n, f.bin,
         ({_P_SQL} - {_Q_SQL}) * ln({_P_SQL} / {_Q_SQL}) AS term
  FROM filled f JOIN tot t USING (event_type)
)
SELECT event_type, ref_n, cur_n,
       round(list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
                         (a, b) -> a + b), 6) AS psi
FROM terms GROUP BY event_type, ref_n, cur_n
"""
