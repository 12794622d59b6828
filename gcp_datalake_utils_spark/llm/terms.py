"""Per-document (term, tf) pairs — the shared first stage of the term
pipeline (tfidf_top_terms, inverted_index, corpus_vocabulary,
simhash64).

Mechanics that make this scale-correct: ``explode`` + partial-mode
hash aggregation. After explode, one document's tokens all sit in the
partition that held the document row, so the PARTIAL HashAggregate
(which runs before the exchange) collapses every (doc_id, term)
duplicate map-side — what crosses the network is the distinct pair
stream with its counts, never raw tokens — and the whole path is
whole-stage codegen.

Two designs that were measured and REJECTED (r4):

- a narrow in-row rollup (array_sort + run-boundary diff via
  higher-order functions): saves the first exchange entirely, but HOF
  lambdas are interpreted, not codegen — 2.5x slower on the sf0.1
  driver corpus and 7x slower at sf1 (short docs, 10x rows). The
  partial agg already achieves the shuffle reduction the narrow form
  was built for.
- the r3 two-pass shape (tf over raw tokens + tokens.distinct for
  df): tokenizes and shuffles the token stream twice and joins the
  results; the single pair rollup replaces both passes.

Downstream consumers therefore need only pair-sized shuffles:
- ``tfidf_top_terms``: df agg (term) + broadcast back + one doc_id
  window exchange;
- ``inverted_index``: term window + same-key agg, no join;
- ``corpus_vocabulary``: one term agg + TakeOrderedAndProject;
- ``simhash64``: one md5 per DISTINCT (doc, term), tf as the vote
  multiplier, codegen'd vote sums.

Reference parity: the reference tokenizes driver-side per document
(schema_analyzer string handling); the semantics here (whitespace
split of trimmed text) match its test corpus exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_term_pairs(d: DataFrame) -> DataFrame:
    """(doc_id, term, tf): one row per distinct term per document with
    its in-document frequency. Null text explodes to no rows.

    The tokenize+explode+partial-agg pass is the stage's cost; a
    single-split local scan would run it on one core, so the input is
    conditionally fanned out by doc_id (scaled_repartition — a no-op
    on multi-split corpora). All downstream consumers aggregate exact
    integers, so the result is partitioning-invariant."""
    from gcp_datalake_utils_spark.sources import scaled_repartition
    toks = scaled_repartition(d, "doc_id").select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("term"))
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
