"""Substring-level duplication statistics: the duplicated-n-gram
fraction (north-star extension; the per-document statistic behind
exact-substring training-data dedup a la Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

Document-level dedup (llm/dedup.py) and fixed-segment paragraph dedup
(llm/paradedup.py) both miss *sliding* repeats: a span repeated at a
different offset never aligns with a 16-token segment boundary. The
standard diagnostic is the fraction of a document's word n-grams
(n=5 here) that occur more than once corpus-wide — documents with a
high fraction are substring-level duplicates or heavy quoters and get
dropped or trimmed before training.

Spark-first shape, and why it holds at 100 TB:

1. gram generation is a NARROW generated-array projection — one
   ``split`` per row, ONE ``xxhash64`` per WORD, then a ``transform``
   over offsets that combines five pre-hashed longs with one more
   ``xxhash64``: only the 8-byte gram hash ever leaves the row — gram
   TEXT never crosses the network, so shuffle payload is ~40x smaller
   than shipping 5-word strings. (Hashing words once and combining
   longs measured 1.7x faster than per-offset ``slice`` +
   ``array_join`` + string-hash: higher-order-function lambdas are
   interpreted, so the per-element work must be allocation-free.)
   The small local corpus file is fanned out by doc_id first — same
   rationale as llm/dedup.shingle_rows: a one-split parquet file
   otherwise serializes the ~250x explode on one core, while at
   100 TB the input has thousands of splits and the repartition of
   raw docs is the step you DELETE;
2. the corpus-wide gram count is ONE unbounded window COUNT over the
   gram-hash partition of the occurrence rows (no per-(doc, gram)
   pre-aggregation round-trip: that would add a third exchange for
   at most a sliver of map-side reduction, since within-document
   gram repeats are rare);
3. the per-document rollup is one doc-keyed partial agg.
   Total: the gram-hash and doc-id exchanges plus the local fan-out
   (plan-guarded in tests/test_round7b_ops.py). A corpus-common gram
   is the classic skewed key; because the hot key is an 8-byte hash,
   AQE skew-partition splitting applies directly.

Engine-parity note: Spark groups by ``xxhash64`` of the five word
hashes (the 100 TB shape) while the DuckDB oracle groups by the gram
string — the checked statistic is hash-invariant, so they agree
unless two distinct grams collide in 64 bits (~2^-64 per pair;
verified collision-free on the test corpora).

Reference parity: the reference has no substring operator (its unit is
the table/column); extension per SURVEY.md §1.2 / §7.2 step 8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

NGRAM = 5

# duplicated-occurrence share above which a document is flagged for
# substring-level trimming (Lee et al. drop/trim threshold class)
DUP_HEAVY = 0.5


def _gram_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gh): one row per sliding 5-gram occurrence, gram
    hashed to 64 bits before it leaves the row. Documents shorter
    than one gram yield no rows (mirrored by the oracle's
    ``len(ws) >= 5`` guard)."""
    d = load_table(spark, sf_dir, "documents")
    n_part = max(int(d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")) // 2, 8)
    d = (d.repartition(n_part, "doc_id")
         .select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws")))
    n = F.size("ws")
    wh = F.transform("ws", lambda w: F.xxhash64(w))
    d = d.where(n >= NGRAM).select("doc_id", wh.alias("wh"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("wh") - NGRAM + 1),
        lambda i: F.xxhash64(
            *[F.element_at("wh", i + k) for k in range(NGRAM)]))
    return d.select("doc_id", F.explode(grams).alias("gh"))


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] per-document duplicated-5-gram share: of the document's
    sliding word 5-grams, how many (occurrence-weighted) also occur
    elsewhere in the corpus — or again in the same document. Columns:
    (doc_id, n_grams, dup_grams, dup_fraction, dup_heavy)."""
    gcount = F.count("*").over(Window.partitionBy("gh"))
    scored = (_gram_rows(spark, sf_dir)
              .select("doc_id", gcount.alias("gcount")))
    dup_one = F.when(F.col("gcount") > 1, 1).otherwise(0)
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(dup_one).alias("dup_grams"))
            .select("doc_id", "n_grams", "dup_grams",
                    F.round(F.col("dup_grams")
                            / F.col("n_grams").cast("double"), 6)
                    .alias("dup_fraction"),
                    ((F.col("dup_grams")
                      / F.col("n_grams").cast("double")) > DUP_HEAVY)
                    .alias("dup_heavy")))


def dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] corpus-level duplication summary in ONE row: total gram
    occurrences, distinct grams, distinct grams that repeat, and the
    occurrence-weighted duplication rate. One exchange (gram-hash
    groupBy with map-side combine), then a scalar agg."""
    per_gram = (_gram_rows(spark, sf_dir)
                .groupBy("gh").agg(F.count("*").alias("cnt")))
    dup = F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))
    return per_gram.agg(
        F.sum("cnt").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
        .alias("dup_distinct_grams"),
        F.round(F.sum(dup) / F.sum("cnt").cast("double"), 6)
        .alias("dup_occurrence_rate"))


_GRAMS_SQL = r"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS g
  FROM toks, UNNEST(range(1, len(ws) - 3)) AS t(i)
  WHERE len(ws) >= 5
)"""

DUP_NGRAM_FRACTION_ORACLE = f"""
WITH {_GRAMS_SQL},
tf AS (SELECT doc_id, g, count(*) AS tf FROM grams GROUP BY 1, 2),
gl AS (SELECT doc_id, tf,
              SUM(tf) OVER (PARTITION BY g) AS gcount
       FROM tf)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN gcount > 1 THEN tf ELSE 0 END) AS BIGINT)
         AS dup_grams,
       round(SUM(CASE WHEN gcount > 1 THEN tf ELSE 0 END)
             / CAST(SUM(tf) AS DOUBLE), 6) AS dup_fraction,
       (SUM(CASE WHEN gcount > 1 THEN tf ELSE 0 END)
        / CAST(SUM(tf) AS DOUBLE)) > {DUP_HEAVY} AS dup_heavy
FROM gl GROUP BY doc_id
"""

DUP_NGRAM_STATS_ORACLE = f"""
WITH {_GRAMS_SQL},
per_gram AS (SELECT g, count(*) AS cnt FROM grams GROUP BY g)
SELECT CAST(SUM(cnt) AS BIGINT) AS total_grams,
       CAST(count(*) AS BIGINT) AS distinct_grams,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_distinct_grams,
       round(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
             / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_occurrence_rate
FROM per_gram
"""
