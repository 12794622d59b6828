"""Boilerplate detection: flag documents dominated by corpus-common
shingles (the CCNet/C4-style cleanup step between dedup and training).

Navigation chrome, cookie banners and templated footers repeat across
thousands of pages without any two pages being near-duplicates, so LSH
dedup (llm/dedup.py) never removes them. The standard counter-measure
works at shingle granularity:

1. one exploded pass over word-3-gram shingles — SHARED with the
   MinHash/LSH family via ``dedup.shingle_rows`` (same repartition-
   before-fan-out shape, same guard for sub-3-word docs);
2. shingle document-frequency — a partial-aggregated groupBy whose
   result is vocabulary-sized (tiny next to the corpus);
3. join the df table back onto the shingle stream — broadcast when
   stats allow (AQE decides), hash join on the shingle otherwise — and
   roll up per doc: what fraction of this doc's shingles are
   corpus-common?

Docs over the fraction threshold are boilerplate-heavy; docs too short
to shingle surface with zero counts and are never flagged (a length
gate is the quality scorer's job, llm/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.dedup import _SHINGLES_SQL, shingle_rows
from gcp_datalake_utils_spark.sources import load_table

# a shingle is "common" when it appears in >= this many distinct docs
BOILER_MIN_DOCS = 3
# a doc is boilerplate-heavy when >= this fraction of its distinct
# shingles are common
BOILER_FRAC = 0.3


def boilerplate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, n_shingles, n_boiler, boiler_frac, flagged) per doc."""
    s = shingle_rows(spark, sf_dir)  # distinct (doc_id, shingle) rows
    df = s.groupBy("s").agg(F.count("*").alias("sdf"))
    per_doc = (
        s.join(df, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"),
             F.sum(F.when(F.col("sdf") >= BOILER_MIN_DOCS, 1)
                   .otherwise(0)).alias("n_boiler")))
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    out = d.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"))
    frac = F.when(F.col("n_shingles") > 0,
                  F.round(F.col("n_boiler") / F.col("n_shingles"), 6)) \
            .otherwise(F.lit(0.0))
    return (out.withColumn("boiler_frac", frac)
            .withColumn("flagged", F.col("boiler_frac") >= BOILER_FRAC))


BOILERPLATE_FLAGS_ORACLE = f"""
WITH shingled AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
),
sdf AS (
  SELECT s, count(*) AS sdf FROM shingled GROUP BY s
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN sdf.sdf >= {BOILER_MIN_DOCS} THEN 1
                       ELSE 0 END) AS BIGINT) AS n_boiler
  FROM shingled JOIN sdf USING (s)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_shingles, 0) AS n_shingles,
       coalesce(p.n_boiler, 0) AS n_boiler,
       CASE WHEN coalesce(p.n_shingles, 0) > 0
            THEN round(coalesce(p.n_boiler, 0)
                       / CAST(p.n_shingles AS DOUBLE), 6)
            ELSE 0.0 END AS boiler_frac,
       CASE WHEN coalesce(p.n_shingles, 0) > 0
            THEN round(coalesce(p.n_boiler, 0)
                       / CAST(p.n_shingles AS DOUBLE), 6)
            ELSE 0.0 END >= {BOILER_FRAC} AS flagged
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""
