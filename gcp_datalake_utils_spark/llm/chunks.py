"""Token-window document chunking (north-star training-data op):
split each document into fixed-size overlapping token windows — the
tokenize-and-pack step every LLM pretraining pipeline runs before
sequence packing.

Spark-first shape: whitespace tokens -> a generated array of window
start offsets (``ceil((len - W)/stride) + 1`` chunks, so a trailing
window fully contained in the previous one is never emitted) ->
``posexplode`` to one row per chunk. All narrow, built-in expressions:
chunking 100 TB is embarrassingly parallel with NO shuffle at all —
the only wide operation a real pipeline adds downstream is the
group-by-sequence-length packing pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks

_WORDS = "string_split(trim(text), ' ')"


def chunk_text_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text): the shared chunking pass —
    doc_chunks and the BPE packing twin both consume it."""
    # staged tokenization: the slice inside the chunk lambda references
    # the materialized attribute — an inline split would re-tokenize
    # the document once per chunk window
    words = F.col("ws")
    n = F.size(words)
    n_chunks = (F.ceil(F.greatest(n - CHUNK_TOKENS, F.lit(0))
                       / CHUNK_STRIDE) + 1).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * CHUNK_STRIDE + 1, CHUNK_TOKENS), " "))
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " ").alias("ws"))
    return d.select("doc_id", F.posexplode(chunk)
                    .alias("chunk_idx", "chunk_text"))


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, chunk_idx, n_chunk_tokens, chunk_md5): overlapping
    32-token windows at stride 24; the last chunk may be short, and a
    doc shorter than one window yields exactly one chunk."""
    return (chunk_text_frame(spark, sf_dir)
            .select("doc_id", "chunk_idx",
                    F.size(F.split("chunk_text", " "))
                    .cast("long").alias("n_chunk_tokens"),
                    F.md5(F.col("chunk_text").cast("binary"))
                    .alias("chunk_md5")))


DOC_CHUNKS_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_WORDS} AS words,
         CAST(ceil(greatest(len({_WORDS}) - {CHUNK_TOKENS}, 0)
                   / {CHUNK_STRIDE}.0) AS INTEGER) + 1 AS n_chunks
  FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(i AS INTEGER) AS chunk_idx,
         array_to_string(
           words[i * {CHUNK_STRIDE} + 1 :
                 i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
           AS chunk_text
  FROM base, unnest(range(0, n_chunks)) AS t(i)
)
SELECT doc_id, chunk_idx,
       CAST(len(string_split(chunk_text, ' ')) AS BIGINT)
         AS n_chunk_tokens,
       md5(chunk_text) AS chunk_md5
FROM chunks
"""
