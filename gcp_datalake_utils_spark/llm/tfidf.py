"""Per-document TF-IDF top terms (north-star text-analysis op): the
classic keyword-extraction / relevance-weighting primitive.

Shuffle budget at 100 TB: the (doc_id, term, tf) rollup partial-
aggregates map-side (``terms.doc_term_pairs`` — raw tokens never cross
the network), so:

1. document frequency: pair-sized groupBy(term); the vocabulary-sized
   result broadcasts back onto the pairs (AQE decides at runtime)
2. corpus size N joins in as a broadcast 1-row aggregate (never a
   driver-side collect)
3. top-k per doc: window partitioned by doc_id — per-group k, never a
   global sort. Every exchange in the plan carries pair-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.terms import doc_term_pairs
from gcp_datalake_utils_spark.sources import load_table

TOP_TERMS = 3

_WORDS = "string_split(trim(text), ' ')"


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, term, tf, df, tfidf, rank): top-3 terms per doc by
    tf * ln(N/df), ties broken by term text so ranks are total."""
    d = load_table(spark, sf_dir, "documents")
    tf = doc_term_pairs(d)
    df = (tf.groupBy("term")
          .agg(F.count("*").alias("df")))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(F.broadcast(df), "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf")
                                  * F.log(F.col("n_docs")
                                          / F.col("df")), 6)))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.desc("tfidf"), F.asc("term")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_TERMS)
            .select("doc_id", "term", "tf", "df", "tfidf",
                    F.col("rank").cast("int").alias("rank")))


TFIDF_TOP_TERMS_ORACLE = f"""
WITH tokens AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tokens GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens
       GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6)
           AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored)
WHERE rank <= {TOP_TERMS}
"""


VOCAB_TOP_K = 200


def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] vocabulary builder: top-K terms by document frequency (with
    total term frequency as tie data) — the tokenizer-training /
    stopword-mining pass. Pair rollup + pair-sized term agg; the
    global top-K plans as TakeOrderedAndProject (each partition
    contributes its local top K; no corpus-wide sort)."""
    d = load_table(spark, sf_dir, "documents")
    w = (doc_term_pairs(d)
         .groupBy("term")
         .agg(F.count("*").alias("doc_freq"),
              F.sum("tf").alias("term_freq")))
    top = w.orderBy(F.desc("doc_freq"), F.desc("term_freq"),
                    "term").limit(VOCAB_TOP_K)
    rank_w = Window.orderBy(F.desc("doc_freq"), F.desc("term_freq"),
                            "term")
    return top.withColumn(
        "rank", F.row_number().over(rank_w).cast("int"))


CORPUS_VOCABULARY_ORACLE = f"""
SELECT term, doc_freq, term_freq,
       CAST(row_number() OVER (ORDER BY doc_freq DESC, term_freq DESC,
                               term) AS INTEGER) AS rank
FROM (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
         count(*) AS term_freq
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        FROM documents)
  GROUP BY term
)
ORDER BY doc_freq DESC, term_freq DESC, term
LIMIT {VOCAB_TOP_K}
"""
