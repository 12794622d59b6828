"""Pairwise source-vocabulary overlap (corpus-composition analytics,
north-star extension).

Before mixing corpora into a training run, pipelines measure how much
the candidate sources repeat each other: near-identical vocabularies
mean the second source adds volume, not diversity. The statistic is
the Jaccard similarity of each source pair's distinct token
vocabularies.

Spark-first shape, and why it holds at 100 TB:

1. the ONLY wide operation over document-scale data is a single
   groupBy on the term: ``collect_set(source)`` per term both
   DEDUPLICATES (term, source) occurrences map-side (partial
   aggregation collapses each partition's repeats before the
   exchange) and gathers the per-term source list in the same pass;
2. pair expansion happens AFTER that reduction, JVM-side, on the
   sorted per-term source array (``transform`` x ``slice`` nested
   combination generation) — with S sources a term fans out to at
   most S*(S-1)/2 rows, and the downstream pair groupBy is partially
   aggregated again. The naive alternative — a term self-join —
   re-shuffles the exploded (term, source) relation twice and its
   skew on stopword-class terms is quadratic per hot term; the
   collect_set shape caps a hot term's cost at one array of <= S
   entries;
3. per-source vocabulary sizes ride the SAME pair aggregation as the
   diagonal (s, s) self-pairs — |V(s)| = inter(s, s) — so documents
   are scanned and term-shuffled exactly ONCE; the final Jaccard
   assembly joins the <= S^2-row pair-count aggregate against its own
   diagonal (broadcast, with the pair exchange AQE-reused).

Reference parity: the reference has no corpus-composition operator;
extension per SURVEY.md §1.2. Tokenization matches llm/text.py
(whitespace split of trimmed text) so vocabularies agree with
vocab_entropy / tfidf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table


def _term_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, srcs): the sorted distinct source list per token. The
    small local corpus file is fanned out before the ~250x token
    explode (same rationale as llm/dedup.shingle_rows: a one-split
    parquet file serializes the explode on one core; at 100 TB the
    input has thousands of splits and this repartition is deleted)."""
    d = load_table(spark, sf_dir, "documents")
    n_part = max(int(d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")) // 2, 8)
    d = (d.repartition(n_part, "doc_id")
         .select("source",
                 F.explode(F.split(F.trim("text"), r"\s+")).alias("term")))
    return (d.groupBy("term")
            .agg(F.array_sort(F.collect_set("source")).alias("srcs")))


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] Jaccard similarity of distinct-token vocabularies for every
    source pair: (src_a, src_b, inter, union_sz, jaccard), src_a <
    src_b lexicographically."""
    ts = _term_sources(spark, sf_dir)
    # combination generation on the per-term source array: for the
    # i-th source, pair it with ITSELF and every later source in the
    # sorted list — the diagonal (s, s) rows count each source's
    # vocabulary size in the same aggregation as the intersections,
    # so ONE term-keyed exchange feeds intersections and vocab sizes
    # alike (the tiny pair-count aggregate is then consumed three
    # times via AQE ReusedExchange, never re-scanning documents)
    pairs = F.flatten(F.transform(
        "srcs",
        lambda x, i: F.transform(
            F.slice("srcs", i + 1, F.size("srcs")),
            lambda y: F.struct(x.alias("src_a"), y.alias("src_b")))))
    counts = (ts.select(F.explode(pairs).alias("p"))
              .select("p.src_a", "p.src_b")
              .groupBy("src_a", "src_b").agg(F.count("*").alias("inter")))
    inter = counts.where(F.col("src_a") < F.col("src_b"))
    diag = counts.where(F.col("src_a") == F.col("src_b"))
    va = diag.select(F.col("src_a"), F.col("inter").alias("vocab_a"))
    vb = diag.select(F.col("src_a").alias("src_b"),
                     F.col("inter").alias("vocab_b"))
    union_sz = F.col("vocab_a") + F.col("vocab_b") - F.col("inter")
    return (inter
            .join(F.broadcast(va), "src_a")
            .join(F.broadcast(vb), "src_b")
            .select("src_a", "src_b", "inter",
                    union_sz.alias("union_sz"),
                    F.round(F.col("inter") / union_sz.cast("double"), 6)
                    .alias("jaccard")))


SOURCE_VOCAB_OVERLAP_ORACLE = r"""
WITH st AS (
  SELECT DISTINCT source, t.term
  FROM documents,
       UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
),
v AS (SELECT source, count(*) AS vocab FROM st GROUP BY source),
p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      FROM st a JOIN st b USING (term)
      WHERE a.source < b.source GROUP BY 1, 2)
SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
       CAST(va.vocab + vb.vocab - inter AS BIGINT) AS union_sz,
       round(inter / CAST(va.vocab + vb.vocab - inter AS DOUBLE), 6)
         AS jaccard
FROM p
JOIN v va ON va.source = src_a
JOIN v vb ON vb.source = src_b
"""
