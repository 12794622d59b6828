"""Schema-evolution reads: one dataset written by two writer
generations with different schemas, read back as a single table.

Every long-lived lake table hits this: a new pipeline release adds a
column, and years of old files lack it. The Spark-native answer is
``spark.read.option("mergeSchema", "true")`` — the scan unions the
file footers' schemas and back-fills missing columns with NULL, so
downstream plans see ONE stable schema. (The reference handles the
same situation catalog-side with ALTER TABLE metadata
(bq_schema_manager paths); this operator exercises the file-level
semantics those catalogs describe.)

Scale note: schema merging happens at FOOTER level (one small read
per file at planning time, parallelized by the driver's listing job);
row data is never rewritten, and column pruning still reaches each
file with its own physical schema. The [Q] query proves both: the
merged scan groups by writer generation and checks the back-filled
column is NULL exactly for the legacy files.

The two generations are deterministic slices of ``orders`` (even keys
written by the legacy writer without `o_priority_rank`, odd keys by
the new writer with it), so the DuckDB oracle reproduces the merged
result from the canonical table without touching the scratch store —
the same trick the snapshot queries use.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources.registry import load_table
from gcp_datalake_utils_spark.sources.scratch import pid_scratch


def _scratch(sf_dir: str) -> str:
    # pid-scoped + atexit-removed + dead-pid-orphan-swept (scratch.py)
    return pid_scratch("/tmp/spark_graft_evolution", sf_dir)


def evolving_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] mergeSchema read across writer generations: (generation,
    n_rows, n_null_rank, rank_sum) — generation 0 rows must carry a
    NULL back-filled `o_priority_rank`, generation 1 the computed
    rank; rank_sum proves the new column's values survive the merge."""
    base = _scratch(sf_dir)
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    legacy = orders.where("o_orderkey % 2 = 0") \
        .select("o_orderkey", "o_totalprice")
    modern = orders.where("o_orderkey % 2 <> 0") \
        .select("o_orderkey", "o_totalprice",
                (F.col("o_custkey") % 100).cast("int")
                .alias("o_priority_rank"))
    legacy.write.mode("overwrite").parquet(os.path.join(base, "g0"))
    modern.write.mode("overwrite").parquet(os.path.join(base, "g1"))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(os.path.join(base, "g0"),
                       os.path.join(base, "g1")))
    gen = (F.col("o_orderkey") % 2).cast("int")
    return (merged
            .groupBy(gen.alias("generation"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.when(F.col("o_priority_rank").isNull(), 1)
                       .otherwise(0)).cast("long").alias("n_null_rank"),
                 F.coalesce(F.sum("o_priority_rank"), F.lit(0))
                 .cast("long").alias("rank_sum")))


EVOLVING_READ_ORACLE = """
SELECT CAST(o_orderkey % 2 AS INTEGER) AS generation,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_rank,
       CAST(coalesce(sum(CASE WHEN o_orderkey % 2 <> 0
                              THEN o_custkey % 100 END), 0)
            AS BIGINT) AS rank_sum
FROM orders
GROUP BY 1
"""
