"""Z-order (Morton-curve) layout clustering — the multi-dimension
data-layout primitive behind `OPTIMIZE ZORDER BY` in lakehouse
engines.

Range-partitioning a table by ONE column gives perfect pruning on
that column and none on any other. Interleaving the bits of two (or
more) quantized columns into a single sort key makes rows that are
close in EITHER dimension land in the same files, so min/max file
statistics prune selective filters on BOTH columns. The write-time
recipe is one narrow expression + a range sort:

    df.withColumn("z", <this z-value>) \\
      .repartitionByRange(N, "z").sortWithinPartitions("z") \\
      .write.parquet(...)

The [Q] query computes the z-value JVM-side (pure integer bit math,
exactly mirrored in the oracle) and reports per-z-bucket extent
statistics of both dimensions over `orders` — the evidence a layout
job emits: every bucket's (custkey, orderday) bounding box is tight
in BOTH axes, which is exactly what makes the file-skipping work.
Scale shape: one narrow projection + one partial-aggregated groupBy
on the bucket id; the write path adds one range exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources.registry import load_table

Z_BITS = 8  # per-dimension quantization width (16-bit z-value)
Z_BUCKET_SHIFT = 10  # keep the top 6 z bits -> 64 layout buckets


def _interleave(a, b):
    """Morton-interleave two Z_BITS-wide integer columns: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    z = F.lit(0)
    for i in range(Z_BITS):
        z = (z
             + F.shiftleft(F.shiftrightunsigned(a, i)
                           .bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftrightunsigned(b, i)
                           .bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def _interleave_sql(a: str, b: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] per-z-bucket bounding boxes over orders: (z_bucket, n_rows,
    min_cust, max_cust, min_day, max_day) for the Morton key over
    (quantized custkey, quantized order day)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.floor(
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        / F.lit(86_400_000_000))
    # quantize both dims to Z_BITS via range-independent modulus-free
    # scaling: top bits of the value's offset inside [min, max] would
    # need a pre-pass; the layout key only needs MONOTONE locality, so
    # use the low Z_BITS of custkey / day directly scaled down by a
    # fixed stride (custkey stride 64, day stride 4) — deterministic
    # and identical in both engines.
    # true integer division (`div`) on BOTH engines: `/` is double
    # division and a double->int cast truncates in Spark but ROUNDS in
    # DuckDB (the rangejoin advice-fix class)
    qa = F.expr("o_custkey div 64") \
        .bitwiseAND(F.lit((1 << Z_BITS) - 1))
    qb = F.expr(
        "floor(unix_micros(CAST(o_orderdate AS TIMESTAMP)) "
        "/ 86400000000.0) div 4") \
        .bitwiseAND(F.lit((1 << Z_BITS) - 1))
    z = _interleave(qa, qb)
    return (o.select(
        F.shiftrightunsigned(z, Z_BUCKET_SHIFT).cast("int")
        .alias("z_bucket"),
        F.col("o_custkey").alias("cust"), day.alias("day"))
        .groupBy("z_bucket")
        .agg(F.count("*").alias("n_rows"),
             F.min("cust").cast("long").alias("min_cust"),
             F.max("cust").cast("long").alias("max_cust"),
             F.min("day").cast("long").alias("min_day"),
             F.max("day").cast("long").alias("max_day")))


ZORDER_LAYOUT_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS cust,
         CAST(floor(epoch_us(o_orderdate) / 86400000000.0) AS BIGINT)
           AS day
  FROM orders
),
keyed AS (
  SELECT cust, day,
         {_interleave_sql(
             f"((cust // 64) & {(1 << Z_BITS) - 1})",
             f"((day // 4) & {(1 << Z_BITS) - 1})")}
           AS z
  FROM base
)
SELECT CAST(z >> {Z_BUCKET_SHIFT} AS INTEGER) AS z_bucket,
       count(*) AS n_rows,
       CAST(min(cust) AS BIGINT) AS min_cust,
       CAST(max(cust) AS BIGINT) AS max_cust,
       CAST(min(day) AS BIGINT) AS min_day,
       CAST(max(day) AS BIGINT) AS max_day
FROM keyed
GROUP BY 1
"""
