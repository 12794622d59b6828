"""Per-document (term, tf) pairs as a NARROW projection — the shared
first stage of the term pipeline (tfidf_top_terms, inverted_index,
corpus_vocabulary).

The classic first step — explode tokens then groupBy(doc_id, term) —
ships the FULL token stream into an exchange before anything
aggregates. (After explode, one document's tokens are in fact already
co-located in a single partition, but Catalyst cannot know that, so the
groupBy still plans a token-sized shuffle.) At 100 TB that first
shuffle dominates the entire pipeline.

Here the rollup happens INSIDE the document row instead: sort the token
array (O(n log n), whole-stage codegen) and diff the run boundaries —
equivalent to a per-document COUNT(*) GROUP BY term, as a pure
expression. The first thing that ever reaches an exchange is the
pre-aggregated (doc_id, term, tf) pair stream, bounded by per-document
vocabulary, typically several times smaller than the raw token stream.
Downstream consumers then need only pair-sized shuffles:

- ``tfidf_top_terms``: df agg (pair-sized, term) + broadcast back +
  one doc_id window exchange;
- ``inverted_index``: ONE term exchange total (window + same-key agg);
- ``corpus_vocabulary``: one term exchange + TakeOrderedAndProject.

Every intermediate array is staged in its own select before any lambda
indexes into it — Catalyst re-inlines non-attribute expressions into
HOF lambda bodies per element reference (the r2 quadratic; guarded by
tests/test_plans.py::test_tokenize_once_counts).

Reference parity: the reference tokenizes driver-side per document
(schema_analyzer string handling); the semantics here (whitespace
split of trimmed text) match its test corpus exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_term_pairs(d: DataFrame) -> DataFrame:
    """(doc_id, term, tf): one row per distinct term per document, with
    its in-document frequency — no shuffle, no explode of raw tokens.

    Stage 1 sorts the token array; stage 2 keeps the positions where a
    new run starts; stage 3 emits (term, next_start - start) per run.
    Null text yields a null array and the explode drops the row — the
    same behavior as explode(split(...)) on null."""
    toks = d.select(
        "doc_id",
        F.array_sort(F.split(F.trim("text"), " ")).alias("t"))
    idx = toks.select(
        "doc_id", "t",
        F.sequence(F.lit(0), F.size("t") - 1).alias("ix"))
    starts = idx.select(
        "doc_id", "t",
        F.filter(
            "ix",
            lambda i: (i == F.lit(0))
            | (F.get(F.col("t"), i) != F.get(F.col("t"), i - 1)))
        .alias("s"))
    staged = starts.select(
        "doc_id", "t", "s",
        F.size("s").alias("k"), F.size("t").alias("n"))
    runs = staged.select(
        "doc_id",
        F.explode(F.transform(
            "s",
            lambda x, j: F.struct(
                F.get(F.col("t"), x).alias("term"),
                (F.when(j < F.col("k") - 1, F.get(F.col("s"), j + 1))
                 .otherwise(F.col("n")) - x)
                .cast("long").alias("tf")))).alias("p"))
    return runs.select("doc_id", F.col("p.term").alias("term"),
                       F.col("p.tf").alias("tf"))
