"""Substring-span dedup REMOVAL: cut duplicated >=NGRAM-token runs out
of documents and reconstruct the surviving text (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr transform, word-gram granularity).

llm/ngramdup.py MEASURES duplicated-gram mass and llm/paradedup.py
removes exact 16-token segments; this module is the transform both
stop short of: every word covered by at least one corpus-duplicated
5-gram occurrence is cut, the maximal covered runs are counted, and
the document is reconstructed from the surviving words. Because
overlapping duplicated grams union into runs, a repeated 20-word
passage is removed as ONE run even though it contributes 16
overlapping grams.

Spark-first shape, and why it holds at 100 TB:

1. gram generation is the llm/ngramdup.py narrow projection — each
   word hashed ONCE (``xxhash64``), grams combined from pre-hashed
   longs, so only 8-byte hashes ever cross the network (measured 1.7x
   over per-offset slice+join+hash; HOF lambdas are interpreted, so
   per-element work must be allocation-free);
2. corpus-wide duplication is ONE unbounded window COUNT over the
   gram-hash partition (the skewed hot gram is an 8-byte key — AQE
   skew-partition splitting applies directly);
3. only DUPLICATED occurrences survive the filter, so the doc-keyed
   aggregation that assembles per-document offset lists shuffles the
   duplicated sliver, not the corpus;
4. reconstruction needs the document words back: ONE doc-keyed join
   (dup-offset lists joined to a column-pruned (doc_id, words) scan),
   then a NARROW Arrow ``mapInPandas`` pass does the interval-union
   sweep per document in O(n + d) numpy (delta array + cumsum — never
   the O(n*d) per-word exists-scan an interpreted HOF would pay) and
   emits fixed-width rows (counts + kept-text md5): document text
   never leaves the pass.

Engine parity: Spark counts gram duplication over 64-bit combined
hashes, the DuckDB oracle over gram strings — hash-invariant unless
two grams collide in 64 bits (~2^-64/pair; collision-free on the test
corpora, same argument as llm/ngramdup.py). kept_text_md5 is md5 of
the space-joined surviving words in both engines (UTF-8).

Reference parity: the reference has no substring operator (its unit
is the table/column); north-star extension per SURVEY.md §1.2/§7.2.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.decontam import BENCH_MOD
from gcp_datalake_utils_spark.llm.ngramdup import NGRAM
from gcp_datalake_utils_spark.sources import load_table

_OUT_SCHEMA = ("doc_id long, n_tokens long, n_removed_tokens long, "
               "n_removed_runs long, kept_text_md5 string")


def _dup_gram_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, offs): sorted 1-based word offsets of every
    corpus-duplicated 5-gram occurrence in the document. Documents
    shorter than one gram (or with no duplicated grams) are absent."""
    rows = _hashed_gram_occurrences(spark, sf_dir)
    gcount = F.count("*").over(Window.partitionBy("gh"))
    return (rows.select("doc_id", "i", gcount.alias("gc"))
            .where(F.col("gc") > 1)
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("i")).alias("offs")))


def _sweep_kernel(batches):
    """Interval-union sweep per document: +1 at each duplicated-gram
    start, -1 past its end, cumsum > 0 marks covered words."""
    for pdf in batches:
        ids, nt, nr, runs, md5s = [], [], [], [], []
        for doc_id, ws, offs in zip(pdf["doc_id"], pdf["ws"],
                                    pdf["offs"]):
            words = list(ws)
            n = len(words)
            if offs is None or len(offs) == 0:
                kept, removed, n_runs = words, 0, 0
            else:
                o = np.asarray(offs, dtype=np.int64) - 1
                delta = np.zeros(n + 1, dtype=np.int64)
                np.add.at(delta, o, 1)
                np.add.at(delta, o + NGRAM, -1)
                mask = np.cumsum(delta[:n]) > 0
                removed = int(mask.sum())
                n_runs = int(mask[0]) + int((mask[1:] & ~mask[:-1]).sum())
                kept = [w for w, m in zip(words, mask) if not m]
            ids.append(doc_id)
            nt.append(n)
            nr.append(removed)
            runs.append(n_runs)
            md5s.append(hashlib.md5(
                " ".join(kept).encode("utf-8")).hexdigest())
        yield pd.DataFrame({"doc_id": ids, "n_tokens": nt,
                            "n_removed_tokens": nr,
                            "n_removed_runs": runs,
                            "kept_text_md5": md5s})


def span_dedup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, n_tokens, n_removed_tokens, n_removed_runs,
    kept_text_md5): every word covered by a corpus-duplicated 5-gram
    occurrence is cut; the md5 fingerprints the reconstructed text
    (space-joined surviving words, '' when everything was removed).
    Untouched documents report 0 removed and the md5 of their
    normalized full text."""
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws")))
    dups = _dup_gram_offsets(spark, sf_dir)
    return (docs.join(dups, "doc_id", "left")
            .mapInPandas(_sweep_kernel, _OUT_SCHEMA))


def span_dedup_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] one-row corpus summary of the span-removal transform:
    (n_docs, n_docs_trimmed, total_tokens, removed_tokens,
    removed_token_rate, removed_runs)."""
    per = span_dedup_removal(spark, sf_dir)
    return per.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_removed_tokens") > 0).cast("long"))
        .alias("n_docs_trimmed"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_removed_tokens").alias("removed_tokens"),
        F.round(F.sum("n_removed_tokens")
                / F.sum("n_tokens").cast("double"), 6)
        .alias("removed_token_rate"),
        F.sum("n_removed_runs").alias("removed_runs"))


def _hashed_gram_occurrences(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """(doc_id, i, gh): every sliding NGRAM-word occurrence with its
    1-based offset and 64-bit combined word-hash key — the shared
    narrow projection behind internal-duplication removal and
    benchmark-span scrubbing."""
    d = load_table(spark, sf_dir, "documents")
    n_part = max(int(d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")) // 2, 8)
    # local fan-out of the one-split test file; at 100 TB the source
    # has thousands of splits and this repartition is deleted
    d = (d.repartition(n_part, "doc_id")
         .select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws")))
    d = (d.where(F.size("ws") >= NGRAM)
         .select("doc_id",
                 F.transform("ws", lambda w: F.xxhash64(w)).alias("wh")))
    occ = F.transform(
        F.sequence(F.lit(1), F.size("wh") - NGRAM + 1),
        lambda i: F.struct(
            i.cast("long").alias("i"),
            F.xxhash64(*[F.element_at("wh", i + k)
                         for k in range(NGRAM)]).alias("gh")))
    return (d.select("doc_id", F.explode(occ).alias("o"))
            .select("doc_id", "o.i", "o.gh"))


def contamination_span_scrub(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """[Q] benchmark-span SCRUBBING — span_dedup_removal's sweep
    pointed at an external reference set instead of corpus-internal
    duplication: every corpus word covered by a 5-gram occurrence that
    also appears in the held-out benchmark slice (``doc_id %
    BENCH_MOD == 0``, the llm/decontam.py convention) is cut, and the
    corpus document is reconstructed from the survivors. This is the
    transform llm/decontam.py stops short of: decontamination FLAGS
    contaminated documents; this row removes the contaminated spans
    and keeps the rest (the production middle ground between dropping
    whole documents and shipping benchmark text).

    Output (corpus docs only): (doc_id, n_tokens, n_removed_tokens,
    n_removed_runs, kept_text_md5).

    100 TB shape: the benchmark gram-hash set is tiny by definition
    (a benchmark small enough to be a benchmark broadcasts), so the
    hit test is a ZERO-SHUFFLE broadcast semi join on 8-byte hashes;
    only hit offsets — the contaminated sliver — shuffle to the
    doc-keyed assembly, and the interval-union sweep reuses
    :func:`_sweep_kernel` unchanged.

    Collision bound (same contract as the span_dedup family): the
    Spark side matches grams by 64-bit xxhash64 keys while the oracle
    matches gram strings, so a hash collision between a corpus gram
    and a benchmark gram would over-scrub one 5-word window. With a
    benchmark set of b distinct grams the per-gram false-hit odds are
    b / 2^64 — ~5e-14 at b=1M; at 100 TB (~1e12 grams vs ~1e8
    benchmark grams) the expected extra scrubbed windows are ~5,
    indistinguishable from the benchmark-set noise floor."""
    occ = _hashed_gram_occurrences(spark, sf_dir)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench_grams = (occ.where(is_bench).select("gh").distinct()
                   .localCheckpoint())
    hits = (occ.where(~is_bench)
            .join(F.broadcast(bench_grams), "gh", "leftsemi")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("i")).alias("offs")))
    docs = (load_table(spark, sf_dir, "documents")
            .where(~is_bench)
            .select("doc_id",
                    F.split(F.trim("text"), r"\s+").alias("ws")))
    return (docs.join(hits, "doc_id", "left")
            .mapInPandas(_sweep_kernel, _OUT_SCHEMA))


def contamination_scrub_rollup(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """[Q] one-row corpus summary of the scrub transform — the number
    a decontamination report leads with: how much benchmark-overlap
    text the corpus was carrying. Same shape as span_dedup_rollup."""
    per = contamination_span_scrub(spark, sf_dir)
    return per.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_removed_tokens") > 0).cast("long"))
        .alias("n_docs_scrubbed"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_removed_tokens").alias("removed_tokens"),
        F.round(F.sum("n_removed_tokens")
                / F.sum("n_tokens").cast("double"), 6)
        .alias("removed_token_rate"),
        F.sum("n_removed_runs").alias("removed_runs"))


# Per-document oracle CTE chain shared by both oracles. Covered word
# j: some duplicated-gram offset i satisfies i <= j <= i+4.
_SPAN_PERDOC_SQL = r"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         array_to_string(list_slice(ws, i, i + 4), ' ') AS g
  FROM toks, UNNEST(range(1, len(ws) - 3)) AS t(i)
  WHERE len(ws) >= 5
),
gc AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
dup AS (SELECT doc_id, i FROM grams JOIN gc USING (g)),
words AS (
  SELECT doc_id, CAST(j AS BIGINT) AS j, ws[CAST(j AS INTEGER)] AS w
  FROM toks, UNNEST(range(1, len(ws) + 1)) AS t(j)
),
cov AS (
  SELECT DISTINCT w.doc_id, w.j
  FROM words w JOIN dup d
    ON d.doc_id = w.doc_id AND w.j BETWEEN d.i AND d.i + 4
),
runs AS (
  SELECT doc_id, count(*) AS n_runs FROM (
    SELECT doc_id, j,
           lag(j) OVER (PARTITION BY doc_id ORDER BY j) AS pj
    FROM cov)
  WHERE pj IS NULL OR pj < j - 1
  GROUP BY doc_id
),
perdoc AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c.j IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_removed_tokens,
         md5(coalesce(string_agg(CASE WHEN c.j IS NULL THEN w.w END,
                                 ' ' ORDER BY w.j), ''))
           AS kept_text_md5
  FROM words w LEFT JOIN cov c
    ON w.doc_id = c.doc_id AND w.j = c.j
  GROUP BY w.doc_id
),
report AS (
  SELECT p.doc_id, p.n_tokens, p.n_removed_tokens,
         CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_removed_runs,
         p.kept_text_md5
  FROM perdoc p LEFT JOIN runs r ON p.doc_id = r.doc_id
)"""

SPAN_DEDUP_REMOVAL_ORACLE = f"""
WITH {_SPAN_PERDOC_SQL}
SELECT * FROM report
"""

SPAN_DEDUP_ROLLUP_ORACLE = f"""
WITH {_SPAN_PERDOC_SQL}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_removed_tokens > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_trimmed,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_removed_tokens) AS BIGINT) AS removed_tokens,
       round(sum(n_removed_tokens) / CAST(sum(n_tokens) AS DOUBLE), 6)
         AS removed_token_rate,
       CAST(sum(n_removed_runs) AS BIGINT) AS removed_runs
FROM report
"""

# Scrub per-document CTE chain: same tail as _SPAN_PERDOC_SQL, but
# `dup` = corpus occurrences whose gram STRING appears anywhere in the
# benchmark slice, and the reconstructed population is corpus docs
# only. Named so BOTH the scrub oracle and its rollup compose from one
# constant (mirroring _SPAN_PERDOC_SQL) instead of string surgery.
_SCRUB_PERDOC_SQL = rf"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         array_to_string(list_slice(ws, i, i + 4), ' ') AS g
  FROM toks, UNNEST(range(1, len(ws) - 3)) AS t(i)
  WHERE len(ws) >= 5
),
bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0),
dup AS (
  SELECT doc_id, i FROM grams JOIN bg USING (g)
  WHERE doc_id % {BENCH_MOD} <> 0
),
words AS (
  SELECT doc_id, CAST(j AS BIGINT) AS j, ws[CAST(j AS INTEGER)] AS w
  FROM toks, UNNEST(range(1, len(ws) + 1)) AS t(j)
  WHERE doc_id % {BENCH_MOD} <> 0
),
cov AS (
  SELECT DISTINCT w.doc_id, w.j
  FROM words w JOIN dup d
    ON d.doc_id = w.doc_id AND w.j BETWEEN d.i AND d.i + 4
),
runs AS (
  SELECT doc_id, count(*) AS n_runs FROM (
    SELECT doc_id, j,
           lag(j) OVER (PARTITION BY doc_id ORDER BY j) AS pj
    FROM cov)
  WHERE pj IS NULL OR pj < j - 1
  GROUP BY doc_id
),
perdoc AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c.j IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_removed_tokens,
         md5(coalesce(string_agg(CASE WHEN c.j IS NULL THEN w.w END,
                                 ' ' ORDER BY w.j), ''))
           AS kept_text_md5
  FROM words w LEFT JOIN cov c
    ON w.doc_id = c.doc_id AND w.j = c.j
  GROUP BY w.doc_id
)
"""

CONTAMINATION_SPAN_SCRUB_ORACLE = f"""
WITH {_SCRUB_PERDOC_SQL}
SELECT p.doc_id, p.n_tokens, p.n_removed_tokens,
       CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_removed_runs,
       p.kept_text_md5
FROM perdoc p LEFT JOIN runs r ON p.doc_id = r.doc_id
"""

_SCRUB_PERDOC_CTE = f"""WITH {_SCRUB_PERDOC_SQL},
scrub_report AS (
  SELECT p.doc_id, p.n_tokens, p.n_removed_tokens,
         CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_removed_runs
  FROM perdoc p LEFT JOIN runs r ON p.doc_id = r.doc_id
)"""

CONTAMINATION_SCRUB_ROLLUP_ORACLE = f"""
{_SCRUB_PERDOC_CTE}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_removed_tokens > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_scrubbed,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_removed_tokens) AS BIGINT) AS removed_tokens,
       round(sum(n_removed_tokens) / CAST(sum(n_tokens) AS DOUBLE), 6)
         AS removed_token_rate,
       CAST(sum(n_removed_runs) AS BIGINT) AS removed_runs
FROM scrub_report
"""
