"""Deterministic stratified / quota sampling for corpus balancing.

A training-data pipeline rarely takes a corpus whole: it draws a fixed
fraction (or quota) per stratum — language, source domain, quality band —
so the mixture matches a target composition. The classic trap at 100 TB
is `ORDER BY random() LIMIT n` per group: a global sort and a
non-reproducible sample. Instead we rank rows inside each stratum by a
deterministic content hash (md5 of the key), so:

* the sample is reproducible run-to-run and engine-to-engine (the DuckDB
  oracle computes the identical md5 ordering);
* the only shuffle is one hash-partitioned window over the stratum key —
  per-group top-N, never a global sort;
* quota arithmetic (ceil of fraction x group size) happens in-plan via a
  count() window over the same partition — no second scan, no driver
  round-trip.

At 100 TB the stratum count is tiny (languages x sources) while strata
are huge; the window shuffle hash-partitions on (lang, source) which can
skew when one stratum dominates. The md5 rank only needs per-stratum
top-N, so AQE skew-split handles long strata; if a single stratum is
pathologically large, pre-aggregate quotas from table statistics and
replace the window with a `WHERE md5 < threshold` scan (documented
escape hatch, not needed at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

SAMPLE_FRAC = 0.2


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] deterministic 20% quota sample per (lang, source) stratum.

    Returns (doc_id, lang, source, stratum_n, sample_rank) for sampled
    docs: rank = md5-order position inside the stratum, stratum_n = the
    stratum's total row count, quota = ceil(0.2 * stratum_n).
    """
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    strat = Window.partitionBy("lang", "source")
    w = strat.orderBy(key.asc(), F.col("doc_id").asc())
    ranked = d.select(
        "doc_id", "lang", "source",
        F.count("*").over(strat).alias("stratum_n"),
        F.row_number().over(w).cast("int").alias("sample_rank"),
    )
    quota = F.ceil(F.lit(SAMPLE_FRAC) * F.col("stratum_n"))
    return ranked.where(F.col("sample_rank") <= quota)


STRATIFIED_SAMPLE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         count(*) OVER (PARTITION BY lang, source) AS stratum_n,
         CAST(row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS INTEGER) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, source, stratum_n, sample_rank
FROM ranked
WHERE sample_rank <= ceil({SAMPLE_FRAC} * stratum_n)
"""
