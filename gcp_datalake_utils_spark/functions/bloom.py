"""Bloom-filter join pre-filtering — the shuffle-avoidance pattern for
selective joins at 100 TB, made explicit and cross-engine auditable.

When a fact-side shuffle join keeps only rows matching a selective
build side, shipping every probe row to the exchange wastes the
network: the standard fix is to broadcast a Bloom filter of the build
keys and drop non-matching probe rows BEFORE the shuffle. Spark can
inject this automatically (`spark.sql.optimizer.runtime.bloomFilter.
enabled`, row-level runtime filters); this module implements the
semantics explicitly so the false-positive behavior is observable,
deterministic, and oracle-checkable:

* build: k=3 md5-salted positions per build key, `distinct` -> a
  bit-position set of AT MOST m=16384 rows no matter how large the
  build side grows (bounded broadcast state, the whole point);
* probe: each probe key explodes to its 3 positions, equi-joins the
  broadcast position set, and passes iff all 3 positions hit;
* audit: the confusion matrix against exact membership. A Bloom filter
  never false-negatives, so the (bloom_pass=false, is_member=true)
  cell must be empty — pytest asserts it, and the [Q] readout shows
  the false-positive mass that the post-shuffle exact join must still
  eliminate.

Determinism: positions are integer md5-prefix arithmetic (identical in
Spark and DuckDB, same idiom as llm/sketches.py); everything else is
joins and counts. Reference parity: the reference validates FK
integrity with exact IN-subquery scans (data_test.py referential
checks); the Bloom pre-filter is this repo's scale-path extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

BLOOM_M = 2048    # bits — deliberately small so the FP cell of the
BLOOM_K = 3       # audit is populated at test SF; production sizes m
BAL_MIN = 8000.0  # to the build-side cardinality (~10 bits/key)


def _positions_spark(key):
    """k md5-salted bit positions for a key, as one exploded column."""
    items = [
        (F.conv(F.substring(F.md5(F.concat(F.lit(str(i)), F.lit("|"),
                                           key.cast("string"))),
                            1, 6), 16, 10)
         .cast("long") % BLOOM_M).cast("int")
        for i in range(BLOOM_K)]
    return F.explode(F.array(*items))


def bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] Bloom pre-filter confusion matrix for the orders->customer
    join restricted to high-balance customers:
    (bloom_pass, is_member, n_orders).

    At 100 TB the `bits` frame broadcasts (<= m rows) and the probe
    side filters BEFORE any shuffle; here the exact branch is kept to
    measure the false-positive mass the filter lets through."""
    cust = (load_table(spark, sf_dir, "customer")
            .where(F.col("c_acctbal") > BAL_MIN)
            .select(F.col("c_custkey").alias("key")))
    bits = (cust.select(_positions_spark(F.col("key")).alias("pos"))
            .distinct())
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    opos = orders.select(
        "o_orderkey", "o_custkey",
        _positions_spark(F.col("o_custkey")).alias("pos"))
    hits = (opos.join(F.broadcast(bits.withColumn("hit", F.lit(1))),
                      "pos", "left")
            .groupBy("o_orderkey", "o_custkey")
            .agg((F.sum(F.coalesce("hit", F.lit(0))) == BLOOM_K)
                 .alias("bloom_pass")))
    member = (orders.join(
        F.broadcast(cust.withColumn("mem", F.lit(1))),
        orders["o_custkey"] == cust["key"], "left")
        .select("o_orderkey",
                (F.coalesce("mem", F.lit(0)) == 1).alias("is_member")))
    return (hits.join(member, "o_orderkey")
            .groupBy("bloom_pass", "is_member")
            .agg(F.count("*").alias("n_orders")))


def _positions_sql(key: str) -> str:
    """DuckDB: one row per (i, position) via an inline k-element list."""
    items = ", ".join(
        f"CAST(('0x' || substr(md5('{i}|' || CAST({key} AS VARCHAR)),"
        f" 1, 6))::BIGINT % {BLOOM_M} AS INTEGER)"
        for i in range(BLOOM_K))
    return f"unnest([{items}])"


BLOOM_PREFILTER_AUDIT_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey AS key FROM customer WHERE c_acctbal > {BAL_MIN}
),
bits AS (
  SELECT DISTINCT {_positions_sql('key')} AS pos FROM cust
),
opos AS (
  SELECT o_orderkey, o_custkey, {_positions_sql('o_custkey')} AS pos
  FROM orders
),
hits AS (
  SELECT o.o_orderkey, o.o_custkey,
         (sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
          = {BLOOM_K}) AS bloom_pass
  FROM opos o LEFT JOIN bits b ON b.pos = o.pos
  GROUP BY o.o_orderkey, o.o_custkey
),
member AS (
  SELECT o.o_orderkey,
         (c.key IS NOT NULL) AS is_member
  FROM orders o LEFT JOIN cust c ON c.key = o.o_custkey
)
SELECT h.bloom_pass, m.is_member, count(*) AS n_orders
FROM hits h JOIN member m USING (o_orderkey)
GROUP BY h.bloom_pass, m.is_member
"""
