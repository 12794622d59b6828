"""Inverted-index construction: term -> posting list + corpus stats.

The retrieval-side primitive of a training-data platform (dedup
attribution, contamination lookups, "which docs mention X" debugging) —
and the textbook case for BOUNDED aggregation state. The naive
``collect_list(doc_id)`` per term explodes on stopword-frequency terms
(one term can post to billions of docs at 100 TB); here the posting list
is capped at the K smallest doc ids and the cap is enforced BEFORE the
collect, via a per-term ``row_number`` filter, so no aggregation buffer
ever holds more than K entries. Corpus-wide truth stays in the
scalar aggregates (``df``, ``total_tf``), which partial-aggregate
map-side and never materialize a list.

Two pair-sized exchanges, no join: the (doc_id, term, tf) rollup
partial-aggregates map-side (``terms.doc_term_pairs`` — raw tokens
never cross the network), the rank window shuffles the pair stream on
term, and the final groupBy(term) reuses the window's partitioning
(df, total_tf and the capped postings all fold in the same agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.terms import doc_term_pairs
from gcp_datalake_utils_spark.sources import load_table

POSTINGS_CAP = 10

_WORDS = "string_split(trim(text), ' ')"


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (term, df, total_tf, postings): document frequency, corpus
    term frequency, and the first K doc ids (ascending) per term."""
    d = load_table(spark, sf_dir, "documents")
    pairs = doc_term_pairs(d)
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = pairs.withColumn("rk", F.row_number().over(w))
    # df, total_tf and the capped postings fold in ONE agg on the
    # window's partitioning: collect_list skips the nulls the rk-cap
    # when() emits, so no aggregation buffer holds more than CAP ids.
    # postings presented as a comma-joined string: array-typed result
    # columns break the driver's pandas-side hasher (r3: "unhashable
    # type: 'list'"), and the string form also shrinks the collect.
    return (ranked.groupBy("term")
            .agg(F.count("*").alias("df"),
                 F.sum("tf").alias("total_tf"),
                 F.array_join(
                     F.array_sort(F.collect_list(
                         F.when(F.col("rk") <= POSTINGS_CAP,
                                F.col("doc_id"))))
                     .cast("array<string>"), ",").alias("postings"))
            .select("term", "df", "total_tf", "postings"))


INVERTED_INDEX_ORACLE = f"""
WITH tokens AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
),
tf AS (SELECT term, count(*) AS total_tf FROM tokens GROUP BY term),
pairs AS (SELECT DISTINCT term, doc_id FROM tokens),
ranked AS (
  SELECT term, doc_id,
         count(*) OVER (PARTITION BY term) AS df,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
  FROM pairs
),
postings AS (
  SELECT term, max(df) AS df,
         list_sort(list(doc_id)) AS postings
  FROM ranked WHERE rk <= {POSTINGS_CAP}
  GROUP BY term
)
SELECT p.term, CAST(p.df AS BIGINT) AS df,
       CAST(tf.total_tf AS BIGINT) AS total_tf,
       array_to_string(
         list_transform(p.postings, x -> CAST(x AS VARCHAR)), ',')
         AS postings
FROM postings p JOIN tf USING (term)
"""
