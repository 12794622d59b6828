"""Collocation mining: pointwise mutual information over term
co-occurrence — the corpus-analysis pass behind phrase detection,
stopword discovery, and tokenizer-merge candidates.

Scale shape (r7 rework): the pair stream is restricted to the top-V
vocabulary (V a constant), so each document contributes at most
V*(V-1)/2 pair rows no matter how long it is — O(docs * V^2) with V^2
a constant, never O(len^2). Two corpus scans total: (1) document
frequencies via explode of per-doc DISTINCT term arrays —
``array_distinct`` runs in-row, so the only exchange carries
per-partition vocabulary-sized partial counts; (2) per-doc vocab hits
via ``array_intersect`` against the top-V terms carried as a
broadcast 1-row array (crossJoin against a broadcast 1-row aggregate,
the repo's standard corpus-constant pattern; the SAME canonical
vocab_row feeds both uses, so ReusedExchange computes it once) — NO
join shuffle. Pair counting is a Gram matrix: each doc's hits become
a V-wide indicator row and an Arrow `mapInPandas` kernel accumulates
X^T @ X per partition (one BLAS call per batch), emitting <=
V*(V-1)/2 (i, j, count) rows per partition — the only exchange after
tokenization carries a few hundred pair keys. df_a/df_b/n_docs attach
to the 20-row top-K via broadcast lookups.

Shapes measured and REJECTED at sf1/sf10 (r7): the r4 doc_id
self-join of the vocab-filtered pair stream (3 tokenize passes + 2
doc-term shuffles: 16-26 s sf10); an in-row nested transform/flatten
pair explode (interpreted HOF allocating ~V^2/2 structs per doc —
the terms.py HOF warning holds even at V=30 when most docs hit most
of the vocabulary: ~10 s sf1).

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

from gcp_datalake_utils_spark.sources import load_table

COLLOC_VOCAB = 30  # pair stream restricted to the top-V terms by df
COLLOC_TOP_K = 20

# 0-based positions of a doc's vocab hits in the sorted vterms array
# (array_position is 1-based; every hit is in vterms by construction).
_IDX_EXPR = "transform(hits, h -> int(array_position(vterms, h)) - 1)"


def _gram_counts(batches):
    """Arrow kernel: co-occurrence counting as a Gram matrix. Each
    batch stacks the per-doc vocab-indicator vectors into X (n x V,
    int64) and accumulates X^T @ X — one BLAS call counts every
    within-doc pair at once, replacing per-doc pair enumeration
    (O(docs * V^2) interpreted pair rows). Emits the upper triangle
    (i < j, count > 0) ONCE per partition: <= V*(V-1)/2 rows no
    matter how many docs it saw. Exact integer counts —
    engine-portable."""
    import numpy as np
    import pandas as pd
    gram = None
    for pdf in batches:
        idx = pdf["idx"]
        n = len(idx)
        if n == 0:
            continue
        x = np.zeros((n, COLLOC_VOCAB), dtype=np.int64)
        rows = np.repeat(np.arange(n), idx.map(len).to_numpy())
        cols = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in idx])
        x[rows, cols] = 1
        g = x.T @ x
        gram = g if gram is None else gram + g
    if gram is not None:
        iu, ju = np.triu_indices(COLLOC_VOCAB, k=1)
        c = gram[iu, ju]
        keep = c > 0
        yield pd.DataFrame({"i": iu[keep].astype("int32"),
                            "j": ju[keep].astype("int32"),
                            "c": c[keep]})


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (term_a, term_b, n_docs_both, df_a, df_b, pmi, rank):
    top-K co-occurring pairs among the top-V vocabulary, ranked by
    co-document count (ties by pair text)."""
    from gcp_datalake_utils_spark.sources import scaled_repartition
    d = load_table(spark, sf_dir, "documents")
    # the vocab-intersect + Gram-matrix kernel downstream is the
    # row's cost; fan out so it is not serialized on one scan split
    # (counts are exact int64 — partitioning-invariant)
    doc_terms = scaled_repartition(
        d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.array_distinct(F.split(F.trim("text"), " ")).alias("terms"))
    df = (doc_terms.select(F.explode("terms").alias("term"))
          .groupBy("term").agg(F.count("*").alias("df")))
    vocab = df.orderBy(F.desc("df"), "term").limit(COLLOC_VOCAB)
    # ONE canonical 1-row vocab aggregate (sorted term array + term->df
    # map) referenced by BOTH crossJoins below: identical broadcast
    # subplans canonicalize equal, so ReusedExchange computes the
    # vocabulary (and its corpus scan) exactly once per query.
    vocab_row = vocab.agg(
        F.sort_array(F.collect_list("term")).alias("vterms"),
        F.map_from_entries(
            F.collect_list(F.struct("term", "df"))).alias("dfs"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    hits = (doc_terms.crossJoin(F.broadcast(vocab_row))
            .select(F.sort_array(
                F.array_intersect("terms", "vterms")).alias("hits"),
                F.col("vterms"))
            .where(F.size("hits") >= 2))
    idx = hits.select(F.expr(_IDX_EXPR).alias("idx"))
    both = (idx.mapInPandas(_gram_counts, "i int, j int, c long")
            .groupBy("i", "j").agg(F.sum("c").alias("n_docs_both")))
    ranked = (both.crossJoin(F.broadcast(vocab_row))
              .select(F.element_at("vterms",
                                   F.col("i") + 1).alias("term_a"),
                      F.element_at("vterms",
                                   F.col("j") + 1).alias("term_b"),
                      "n_docs_both", "dfs")
              .orderBy(F.desc("n_docs_both"), "term_a", "term_b")
              .limit(COLLOC_TOP_K))
    df_a = F.element_at("dfs", F.col("term_a")).alias("df_a")
    df_b = F.element_at("dfs", F.col("term_b")).alias("df_b")
    pmi = F.round(F.log(
        (F.col("n_docs") * F.col("n_docs_both")).cast("double")
        / (F.element_at("dfs", F.col("term_a"))
           * F.element_at("dfs", F.col("term_b"))).cast("double")), 6)
    w_rank = F.row_number().over(
        Window.orderBy(F.desc("n_docs_both"), "term_a", "term_b"))
    return (ranked
            .crossJoin(F.broadcast(n_docs))
            .select("term_a", "term_b", "n_docs_both", df_a, df_b,
                    pmi.alias("pmi"), w_rank.cast("int").alias("rank")))


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
