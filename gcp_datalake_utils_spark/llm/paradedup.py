"""Paragraph-level exact deduplication (the C4/Dolma cleanup pass).

Web-scale corpora repeat *spans* — boilerplate paragraphs, quoted
passages, licence blocks — across documents that are not themselves
near-duplicates, so document-level dedup (llm/dedup.py) leaves them
in. The standard fix dedups at paragraph granularity: every paragraph
keeps exactly its FIRST occurrence corpus-wide and later copies are
dropped, then documents are reconstructed from their surviving
paragraphs.

The driver corpus is a flat token stream (no newline structure), so
"paragraph" here is a fixed 16-token segment — the same segmentation
a newline split would produce on real text, with identical plan shape.

Spark-first shape, and why it holds at 100 TB:

1. segmentation is a NARROW generated-array projection (``transform``
   over a ``sequence`` of offsets + ``slice`` — same machinery as
   llm/chunks.py): no shuffle, embarrassingly parallel;
2. first-occurrence election is ONE exchange keyed on the segment
   md5 (a window ``row_number`` per segment hash ordered by
   (doc_id, seg_idx)). Hashing before the shuffle means 16 bytes per
   segment cross the network, never segment text. A corpus-common
   paragraph is the classic skewed key — AQE skew-join/partition
   splitting applies because the partition key is the hash;
3. per-document reconstruction stats are a second, doc-keyed partial
   agg (map-side combined).

Reference parity: the reference has no paragraph operator (its unit
is the table/column); this is a north-star extension per SURVEY §1.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

SEG_TOKENS = 16

_WORDS = "string_split(trim(text), ' ')"


def _segment_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg_idx, n_seg_tokens, seg_md5): consecutive 16-token
    segments; a doc shorter than one segment yields one short segment."""
    words = F.col("ws")
    n = F.size(words)
    n_segs = (F.ceil(n / F.lit(SEG_TOKENS))).cast("int")
    seg = F.transform(
        F.sequence(F.lit(0), F.greatest(n_segs, F.lit(1)) - 1),
        lambda i: F.array_join(
            F.slice(words, i * SEG_TOKENS + 1, SEG_TOKENS), " "))
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " ").alias("ws"))
    return (d.select("doc_id",
                     F.posexplode(seg).alias("seg_idx", "seg_text"))
            .select("doc_id", "seg_idx",
                    F.size(F.split("seg_text", " "))
                    .cast("long").alias("n_seg_tokens"),
                    F.md5(F.col("seg_text").cast("binary"))
                    .alias("seg_md5")))


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] per-doc paragraph-dedup report: (doc_id, n_segs, n_kept,
    kept_tokens, kept_ratio). A segment is kept iff this (doc_id,
    seg_idx) is the corpus-wide first occurrence of its md5."""
    segs = _segment_rows(spark, sf_dir)
    w = Window.partitionBy("seg_md5").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, 1).otherwise(0)
    return (ranked.groupBy("doc_id")
            .agg(F.count("*").alias("n_segs"),
                 F.sum(kept).cast("long").alias("n_kept"),
                 F.sum(F.when(F.col("rn") == 1, F.col("n_seg_tokens"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("kept_tokens"))
            .select("doc_id", "n_segs", "n_kept", "kept_tokens",
                    F.round(F.col("n_kept") / F.col("n_segs"), 6)
                    .alias("kept_ratio")))


PARAGRAPH_DEDUP_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_WORDS} AS words,
         greatest(CAST(ceil(len({_WORDS}) / {SEG_TOKENS}.0) AS INTEGER),
                  1) AS n_segs
  FROM documents
),
segs AS (
  SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
         array_to_string(
           words[i * {SEG_TOKENS} + 1 : i * {SEG_TOKENS} + {SEG_TOKENS}],
           ' ') AS seg_text
  FROM base, unnest(range(0, n_segs)) AS t(i)
),
ranked AS (
  SELECT doc_id, seg_idx,
         CAST(len(string_split(seg_text, ' ')) AS BIGINT)
           AS n_seg_tokens,
         row_number() OVER (PARTITION BY md5(seg_text)
                            ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id, count(*) AS n_segs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN rn = 1 THEN n_seg_tokens ELSE 0 END)
            AS BIGINT) AS kept_tokens,
       round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS kept_ratio
FROM ranked
GROUP BY doc_id
"""
