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
  bit-position set of AT MOST m rows no matter how large the build
  side grows (bounded broadcast state, the whole point);
* probe: each probe key computes its k positions as scalar columns and
  left-joins the broadcast position set once per hash — passes iff all
  k hit; no explode, no regroup, zero probe-side exchanges;
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


def _position_spark(key, i: int):
    """i-th md5-salted bit position for a key (scalar column)."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(str(i)), F.lit("|"),
                                              key.cast("string"))),
                               1, 6), 16, 10)
            .cast("long") % BLOOM_M).cast("int")


def bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] Bloom pre-filter confusion matrix for the orders->customer
    join restricted to high-balance customers:
    (bloom_pass, is_member, n_orders).

    Probe-side plan shape (the part that must hold at 100 TB): ONE
    orders scan, k broadcast hash joins against the <= m-row position
    set, one broadcast membership join — every probe-side operator is
    narrow, so the only exchange in the whole query is the final
    4-row confusion rollup. (The first cut exploded probe positions
    and re-grouped by order key — a fact-sized shuffle the audit
    showed Catalyst keeping; the per-hash scalar joins express the
    same ALL-k-positions-hit test with no regroup at all.)"""
    cust = (load_table(spark, sf_dir, "customer")
            .where(F.col("c_acctbal") > BAL_MIN)
            .select(F.col("c_custkey").alias("key")))
    # bits is referenced by all k probe joins; the build scan is tiny
    # here so the lazy triple evaluation beats an eager checkpoint
    # (measured) — at a real build size, persist() it once instead
    bits = (cust.select(F.explode(F.array(*[
        _position_spark(F.col("key"), i) for i in range(BLOOM_K)]))
        .alias("pos")).distinct())
    probe = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        *[_position_spark(F.col("o_custkey"), i).alias(f"p{i}")
          for i in range(BLOOM_K)])
    for i in range(BLOOM_K):
        b = (bits.withColumnRenamed("pos", f"p{i}")
             .withColumn(f"hit{i}", F.lit(1)))
        probe = probe.join(F.broadcast(b), f"p{i}", "left")
    pass_expr = None
    for i in range(BLOOM_K):
        term = F.col(f"hit{i}").isNotNull()
        pass_expr = term if pass_expr is None else (pass_expr & term)
    flags = (probe.join(F.broadcast(cust.withColumn("mem", F.lit(1))),
                        probe["o_custkey"] == cust["key"], "left")
             .select(pass_expr.alias("bloom_pass"),
                     F.col("mem").isNotNull().alias("is_member")))
    return (flags.groupBy("bloom_pass", "is_member")
            .agg(F.count("*").alias("n_orders")))


def _position_sql(key: str, i: int) -> str:
    return (f"CAST(('0x' || substr(md5('{i}|' || CAST({key} AS VARCHAR)),"
            f" 1, 6))::BIGINT % {BLOOM_M} AS INTEGER)")


_BITS_ITEMS = ", ".join(_position_sql("key", i) for i in range(BLOOM_K))
_PROBE_COLS = ", ".join(
    f"{_position_sql('o_custkey', i)} AS p{i}" for i in range(BLOOM_K))
_BIT_JOINS = " ".join(
    f"LEFT JOIN bits b{i} ON b{i}.pos = o.p{i}" for i in range(BLOOM_K))
_PASS_SQL = " AND ".join(
    f"b{i}.pos IS NOT NULL" for i in range(BLOOM_K))

BLOOM_PREFILTER_AUDIT_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey AS key FROM customer WHERE c_acctbal > {BAL_MIN}
),
bits AS (
  SELECT DISTINCT unnest([{_BITS_ITEMS}]) AS pos FROM cust
),
probe AS (
  SELECT o_orderkey, o_custkey, {_PROBE_COLS} FROM orders
),
flags AS (
  SELECT ({_PASS_SQL}) AS bloom_pass,
         (c.key IS NOT NULL) AS is_member
  FROM probe o {_BIT_JOINS}
  LEFT JOIN cust c ON c.key = o.o_custkey
)
SELECT bloom_pass, is_member, count(*) AS n_orders
FROM flags GROUP BY bloom_pass, is_member
"""
