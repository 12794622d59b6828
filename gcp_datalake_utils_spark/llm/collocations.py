"""Collocation mining: pointwise mutual information over term
co-occurrence — the corpus-analysis pass behind phrase detection,
stopword discovery, and tokenizer-merge candidates.

Scale shape: the within-document pair join is restricted to the top-V
vocabulary (V a constant), so each document contributes at most
V*(V-1)/2 pair rows no matter how long it is — the pair stream is
O(docs * V^2) with V^2 a constant, never O(len^2). The vocabulary
cutoff broadcasts; doc-pair counts partial-aggregate map-side; the
final top-K plans as TakeOrderedAndProject.

Determinism: PMI = ln((N * c_ab) / (c_a * c_b)) is one ln of one
division of two EXACT integer products (all counts are document
frequencies; products stay far under 2^53), so both engines evaluate
identical doubles.

Reference parity: no counterpart (the reference does no corpus
statistics); training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.terms import doc_term_pairs
from gcp_datalake_utils_spark.sources import load_table

COLLOC_VOCAB = 30  # pair join restricted to the top-V terms by df
COLLOC_TOP_K = 20


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (term_a, term_b, n_docs_both, df_a, df_b, pmi, rank):
    top-K co-occurring pairs among the top-V vocabulary, ranked by
    co-document count (ties by pair text)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = doc_term_pairs(d)  # (doc_id, term, tf)
    df = pairs.groupBy("term").agg(F.count("*").alias("df"))
    vocab = (df.orderBy(F.desc("df"), "term").limit(COLLOC_VOCAB))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    doc_terms = (pairs.join(F.broadcast(vocab), "term")
                 .select("doc_id", "term", "df"))
    a = doc_terms.select("doc_id", F.col("term").alias("term_a"),
                         F.col("df").alias("df_a"))
    b = doc_terms.select("doc_id", F.col("term").alias("term_b"),
                         F.col("df").alias("df_b"))
    both = (a.join(b, "doc_id")
            .where(F.col("term_a") < F.col("term_b"))
            .groupBy("term_a", "term_b", "df_a", "df_b")
            .agg(F.count("*").alias("n_docs_both")))
    pmi = F.round(F.log(
        (F.col("n_docs") * F.col("n_docs_both")).cast("double")
        / (F.col("df_a") * F.col("df_b")).cast("double")), 6)
    ranked = (both.crossJoin(F.broadcast(n_docs))
              .orderBy(F.desc("n_docs_both"), "term_a", "term_b")
              .limit(COLLOC_TOP_K))
    w_rank = F.row_number().over(
        Window.orderBy(F.desc("n_docs_both"), "term_a", "term_b"))
    return ranked.select(
        "term_a", "term_b", "n_docs_both", "df_a", "df_b",
        pmi.alias("pmi"), w_rank.cast("int").alias("rank"))


PMI_COLLOCATIONS_ORACLE = f"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
pairs AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM pairs GROUP BY term),
vocab AS (SELECT term, df FROM df
          ORDER BY df DESC, term LIMIT {COLLOC_VOCAB}),
n AS (SELECT count(*) AS n_docs FROM documents),
dt AS (SELECT p.doc_id, p.term, v.df
       FROM pairs p JOIN vocab v USING (term)),
cooc AS (
  SELECT a.term AS term_a, b.term AS term_b,
         a.df AS df_a, b.df AS df_b, count(*) AS n_docs_both
  FROM dt a JOIN dt b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term, a.df, b.df
),
ranked AS (
  SELECT term_a, term_b, n_docs_both, df_a, df_b,
         round(ln(CAST(n.n_docs * n_docs_both AS DOUBLE)
                  / CAST(df_a * df_b AS DOUBLE)), 6) AS pmi,
         CAST(row_number() OVER (
           ORDER BY n_docs_both DESC, term_a, term_b) AS INTEGER)
           AS rank
  FROM cooc CROSS JOIN n
)
SELECT term_a, term_b, n_docs_both, df_a, df_b, pmi, rank
FROM ranked WHERE rank <= {COLLOC_TOP_K}
"""
