"""Sequence packing: assign chunked documents to fixed-token-budget
training sequences (the concatenate-and-cut step after chunking in an
LLM pretraining pipeline).

Token-stream semantics: within each pack partition the chunk stream is
concatenated in deterministic (doc_id, chunk_idx) order and cut every
``PACK_BUDGET`` tokens — a chunk belongs to the pack where its start
offset falls (chunks may straddle a cut, exactly like causal-LM token
streams). One running-sum window per hash-bucket partition:

- the bucket key (``doc_id % N_BUCKETS``) bounds every window partition
  to ~1/N of the corpus, so there is never a global sort or a
  single-partition exchange — at 100 TB N_BUCKETS scales with the
  cluster and each bucket packs independently;
- pack ids are globally unique as (bucket, local_pack) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.chunks import doc_chunks

PACK_BUDGET = 128
N_BUCKETS = 16


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (bucket, doc_id, chunk_idx, start_offset, pack_id,
    pack_local): each chunk's position in its bucket's token stream and
    the training sequence it lands in."""
    ch = doc_chunks(spark, sf_dir)
    bucket = (F.col("doc_id") % N_BUCKETS).cast("int")
    w = (Window.partitionBy("bucket")
         .orderBy("doc_id", "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ch.withColumn("bucket", bucket)
            .withColumn("start_offset",
                        (F.sum("n_chunk_tokens").over(w)
                         - F.col("n_chunk_tokens")).cast("long"))
            .withColumn("pack_local",
                        F.floor(F.col("start_offset") / PACK_BUDGET)
                        .cast("long"))
            .withColumn("pack_id",
                        (F.col("bucket").cast("long")
                         * F.lit(1_000_000_000).cast("long")
                         + F.col("pack_local")).cast("long"))
            .select("bucket", "doc_id", "chunk_idx", "n_chunk_tokens",
                    "start_offset", "pack_local", "pack_id"))


# the oracle re-derives chunk lengths exactly as chunks.DOC_CHUNKS_ORACLE
from gcp_datalake_utils_spark.llm.chunks import (  # noqa: E402
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    _WORDS,
)

SEQUENCE_PACKING_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_WORDS} AS words,
         CAST(ceil(greatest(len({_WORDS}) - {CHUNK_TOKENS}, 0)
                   / {CHUNK_STRIDE}.0) AS INTEGER) + 1 AS n_chunks
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         CAST(len(words[i * {CHUNK_STRIDE} + 1 :
                   i * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS BIGINT)
           AS n_chunk_tokens
  FROM base, unnest(range(0, n_chunks)) AS t(i)
),
offsets AS (
  SELECT CAST(doc_id % {N_BUCKETS} AS INTEGER) AS bucket,
         doc_id, chunk_idx, n_chunk_tokens,
         CAST(sum(n_chunk_tokens) OVER (
                PARTITION BY doc_id % {N_BUCKETS}
                ORDER BY doc_id, chunk_idx
                ROWS UNBOUNDED PRECEDING) - n_chunk_tokens AS BIGINT)
           AS start_offset
  FROM chunks
)
SELECT bucket, doc_id, chunk_idx, n_chunk_tokens, start_offset,
       CAST(floor(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_local,
       CAST(CAST(bucket AS BIGINT) * 1000000000
            + floor(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM offsets
"""


# ---------------------------------------------------------------------------
# Tokenizer-aware twin (round 9, r8 verdict ask #8): the anchor cuts
# packs on WHITESPACE token counts, but the corpus budget selector and
# token_stats already speak the BPE-ish regex pre-tokenizer — a
# pipeline whose packer and budgeter disagree on what a "token" is
# overfills every sequence by the whitespace/BPE ratio. This twin
# keeps the chunk BOUNDARIES whitespace-window based (chunking is a
# structure step) and does all BUDGET arithmetic in BPE tokens, so
# packing and budget selection share one token currency.
# ---------------------------------------------------------------------------


def sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (bucket, doc_id, chunk_idx, n_bpe_tokens, start_offset,
    pack_local, pack_id): sequence_packing with chunk sizes measured
    by text.BPE_PATTERN (GPT-2-style pre-tokenizer regex, the same
    expression token_stats gates). Identical plan shape: one narrow
    chunking scan, regexp_count per chunk (JVM codegen, no UDF), one
    bucket-bounded running-sum window — no global sort, no
    single-partition exchange at any corpus size."""
    from gcp_datalake_utils_spark.llm.chunks import chunk_text_frame
    from gcp_datalake_utils_spark.llm.text import BPE_PATTERN

    ch = (chunk_text_frame(spark, sf_dir)
          .select("doc_id", "chunk_idx",
                  F.regexp_count("chunk_text", F.lit(BPE_PATTERN))
                  .cast("long").alias("n_bpe_tokens")))
    bucket = (F.col("doc_id") % N_BUCKETS).cast("int")
    w = (Window.partitionBy("bucket")
         .orderBy("doc_id", "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ch.withColumn("bucket", bucket)
            .withColumn("start_offset",
                        (F.sum("n_bpe_tokens").over(w)
                         - F.col("n_bpe_tokens")).cast("long"))
            .withColumn("pack_local",
                        F.floor(F.col("start_offset") / PACK_BUDGET)
                        .cast("long"))
            .withColumn("pack_id",
                        (F.col("bucket").cast("long")
                         * F.lit(1_000_000_000).cast("long")
                         + F.col("pack_local")).cast("long"))
            .select("bucket", "doc_id", "chunk_idx", "n_bpe_tokens",
                    "start_offset", "pack_local", "pack_id"))


# ---------------------------------------------------------------------------
# Real merge-table BPE twin (round 10, r9 verdict ask #7): the _bpe
# twin above counts PRE-tokenizer regex matches; this one counts the
# tokens the trained broadcast merge table actually emits, so packing
# arithmetic speaks the same currency the tokenizer produces at
# training time. Identical packing shape — only the chunk-size
# expression changes (narrow Arrow pass, merge table a closure
# constant, per-word memo cache). Not SQL-expressible (iterative
# merge training); pytest-bracketed: counts bit-identical to a driver
# encode replica, pack offsets re-derived from its own counts.
# ---------------------------------------------------------------------------


def sequence_packing_bpe_real(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """[Q, rows-only] (bucket, doc_id, chunk_idx, n_bpe_tokens,
    start_offset, pack_local, pack_id) with chunk sizes in REAL
    merge-table BPE tokens (llm/bpe.py)."""
    import pandas as pd

    from gcp_datalake_utils_spark.llm.bpe import (
        encode_word,
        trained_merges,
    )
    from gcp_datalake_utils_spark.llm.chunks import chunk_text_frame

    ranks = {p: i for i, p in enumerate(trained_merges(spark, sf_dir))}

    def count_kernel(batches):
        cache: dict = {}
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "chunk_idx": pdf["chunk_idx"],
                "n_bpe_tokens": [
                    sum(len(encode_word(w, ranks, cache))
                        for w in t.split())
                    for t in pdf["chunk_text"]],
            })

    ch = (chunk_text_frame(spark, sf_dir)
          .mapInPandas(count_kernel,
                       "doc_id long, chunk_idx int, n_bpe_tokens long"))
    bucket = (F.col("doc_id") % N_BUCKETS).cast("int")
    w = (Window.partitionBy("bucket")
         .orderBy("doc_id", "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ch.withColumn("bucket", bucket)
            .withColumn("start_offset",
                        (F.sum("n_bpe_tokens").over(w)
                         - F.col("n_bpe_tokens")).cast("long"))
            .withColumn("pack_local",
                        F.floor(F.col("start_offset") / PACK_BUDGET)
                        .cast("long"))
            .withColumn("pack_id",
                        (F.col("bucket").cast("long")
                         * F.lit(1_000_000_000).cast("long")
                         + F.col("pack_local")).cast("long"))
            .select("bucket", "doc_id", "chunk_idx", "n_bpe_tokens",
                    "start_offset", "pack_local", "pack_id"))


from gcp_datalake_utils_spark.llm.text import _BPE_SQL  # noqa: E402

SEQUENCE_PACKING_BPE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_WORDS} AS words,
         CAST(ceil(greatest(len({_WORDS}) - {CHUNK_TOKENS}, 0)
                   / {CHUNK_STRIDE}.0) AS INTEGER) + 1 AS n_chunks
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         CAST(len(regexp_extract_all(
                array_to_string(
                  words[i * {CHUNK_STRIDE} + 1 :
                        i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '),
                '{_BPE_SQL}')) AS BIGINT) AS n_bpe_tokens
  FROM base, unnest(range(0, n_chunks)) AS t(i)
),
offsets AS (
  SELECT CAST(doc_id % {N_BUCKETS} AS INTEGER) AS bucket,
         doc_id, chunk_idx, n_bpe_tokens,
         CAST(sum(n_bpe_tokens) OVER (
                PARTITION BY doc_id % {N_BUCKETS}
                ORDER BY doc_id, chunk_idx
                ROWS UNBOUNDED PRECEDING) - n_bpe_tokens AS BIGINT)
           AS start_offset
  FROM chunks
)
SELECT bucket, doc_id, chunk_idx, n_bpe_tokens, start_offset,
       CAST(floor(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_local,
       CAST(CAST(bucket AS BIGINT) * 1000000000
            + floor(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM offsets
"""
