"""Corpus composition rollups: one pass, every (lang × source)
marginal via CUBE — the dataset-card / mixture-weights view a training
corpus ships with.

Spark's ``cube`` plans a single Expand + one partial-aggregated
shuffle — 4 grouping sets cost one scan, not four. ``grouping_id``
disambiguates a genuine NULL dimension value from a subtotal row (both
engines use the same bit order: first cube column = MSB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table


def corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] doc counts / char volume over GROUPING SETS
    ((lang,source),(lang),(source),()) in one aggregation pass."""
    d = load_table(spark, sf_dir, "documents")
    return (d.cube("lang", "source")
            .agg(F.grouping_id().cast("int").alias("gid"),
                 F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.round(F.avg("n_chars"), 6).alias("avg_chars"),
                 F.max("n_chars").cast("long").alias("max_chars"))
            .select("lang", "source", "gid", "n_docs", "total_chars",
                    "avg_chars", "max_chars"))


CORPUS_ROLLUP_ORACLE = """
SELECT lang, source,
       CAST(GROUPING(lang) * 2 + GROUPING(source) AS INTEGER) AS gid,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 6) AS avg_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY CUBE (lang, source)
"""
