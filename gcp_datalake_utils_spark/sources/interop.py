"""JSONL source/sink interop (training corpora ship as JSON-lines at
least as often as parquet; the engine must read and write both).

The [Q] query proves ROUNDTRIP FIDELITY rather than exposing a file
path to the oracle: Spark writes the documents table to JSONL (sink),
reads it back with an explicit schema (source), and aggregates the
READ-BACK rows into per-source counts + an order-invariant content
checksum. The DuckDB oracle computes the same aggregates directly from
the parquet view — if the JSON encoder/decoder mangled one character,
dropped a null, or coerced a type anywhere in the corpus, the value
hash goes red. (Same oracle strategy as sources/snapshots.py: compare
derived truths, never share scratch paths across engines.)

At 100 TB: the JSONL write is an embarrassingly parallel per-partition
sink; the read is schema-pinned (``spark.read.schema(...).json``) —
schema inference over a corpus-scale JSONL directory would be a full
extra scan. The checksum is a SUM of per-row md5 prefixes: partial-
aggregable, order-invariant, so it verifies a distributed roundtrip
without any global sort.

Scratch discipline: per-process dir via sources/scratch.pid_scratch
(pid-scoped, exit-wiped, dead-pid orphans swept) — concurrent gates on
the same box never clobber each other's roundtrip files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table
from gcp_datalake_utils_spark.sources.scratch import pid_scratch

_ROW_STR = "concat_ws('|', doc_id, lang, source, n_chars, text)"


def _row_hash_col():
    s = F.concat_ws("|", "doc_id", "lang", "source", "n_chars", "text")
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10) \
        .cast("long")


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] write documents to JSONL, read them back schema-pinned, and
    summarize the read-back corpus per source: (source, n_docs,
    sum_chars, content_checksum). Matches the oracle's parquet-side
    aggregates iff the roundtrip is lossless."""
    docs = load_table(spark, sf_dir, "documents")
    out = pid_scratch("/tmp/spark_graft_jsonl", sf_dir)
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    return (back.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum(_row_hash_col()).alias("content_checksum")))


JSONL_ROUNDTRIP_ORACLE = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(CAST('0x' || substring(md5({_ROW_STR}), 1, 8)
                     AS BIGINT)) AS BIGINT) AS content_checksum
FROM documents
GROUP BY source
"""


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] same fidelity gate through the CSV sink/source — a different
    failure surface than JSONL (quoting, embedded separators/newlines,
    header handling, numeric re-parse). Schema-pinned read-back with
    explicit quote/escape so free text survives; aggregates must match
    the oracle's parquet-side truth. The read-back sets multiLine=true:
    quoteAll writes embedded newlines inside quotes, and without
    multiLine the line-splitting reader would shred such a row (latent
    on this single-line corpus, wrong on real text)."""
    docs = load_table(spark, sf_dir, "documents")
    out = pid_scratch("/tmp/spark_graft_csv", sf_dir)
    (docs.write.mode("overwrite")
     .options(header=True, quoteAll=True, escape='"')
     .csv(out))
    back = (spark.read.schema(docs.schema)
            .options(header=True, quote='"', escape='"',
                     multiLine=True)
            .csv(out))
    return (back.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum(_row_hash_col()).alias("content_checksum")))


CSV_ROUNDTRIP_ORACLE = JSONL_ROUNDTRIP_ORACLE  # same parquet-side truth
