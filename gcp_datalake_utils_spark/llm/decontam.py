"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out evaluation set (north-star training-data op).

Reference decontamination pipelines hash long n-grams of every benchmark
document and drop training docs with hits. The Spark-first shape:

1. benchmark = a small held-out slice (here ``doc_id % 50 = 0``; in
   production a separate table) — its exploded n-gram set is tiny
   relative to the corpus, so it is **broadcast**: candidate generation
   is a map-side hash join with ZERO shuffle of the 100 TB corpus side.
2. corpus docs explode to distinct word n-grams (same guarded-sequence
   idiom as ``dedup._shingles``; short docs yield an empty array).
3. one partial-aggregated groupBy on (doc_id, bench_doc_id) counts
   shared n-grams — output is |hit pairs|-sized, not corpus-sized.

Everything is built-in Column expressions; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

N_GRAM = 3
BENCH_MOD = 50        # doc_id % BENCH_MOD = 0 -> held-out benchmark doc
MIN_SHARED = 2        # report pairs sharing at least this many n-grams
CONTAM_THRESHOLD = 5  # flag as contaminated at this overlap

_WORDS = "string_split(trim(text), ' ')"


def _word_ngrams_of(ws: str, n: int):
    """Distinct word n-grams from an ALREADY-MATERIALIZED words
    attribute (stage the split() in its own .select first — an inline
    split would be re-inlined into the lambda and re-tokenize the
    document per position, the r2 repetition_flags pathology). Empty
    array for docs shorter than n words (mirrors the oracle's
    range(1, greatest(..)) -> [])."""
    words = F.col(ws)
    return F.array_distinct(F.transform(
        F.when(F.size(words) >= n,
               F.sequence(F.lit(1), F.size(words) - (n - 1)))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j)
                                     for j in range(n)])))


def _ngrams_sql(n: int) -> str:
    idx = " || ' ' || ".join(f"{_WORDS}[i+{j}]" for j in range(n))
    return (f"list_distinct(list_transform("
            f"range(1, greatest(len({_WORDS}) - {n - 2}, 1)), "
            f"i -> {idx}))")


def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, bench_doc_id, n_shared, overlap_ratio, contaminated)
    for every corpus/benchmark pair sharing >= MIN_SHARED word 3-grams.

    ``overlap_ratio`` is n_shared over the benchmark doc's n-gram count
    (the fraction of the eval doc present in the training doc — the
    quantity decontamination thresholds on)."""
    d = load_table(spark, sf_dir, "documents")
    ng = (d.select("doc_id", F.split(F.trim("text"), " ").alias("ws"))
          .select("doc_id",
                  F.explode(_word_ngrams_of("ws", N_GRAM)).alias("g")))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = (ng.where(is_bench)
             .select(F.col("doc_id").alias("bench_doc_id"), "g"))
    bench_sizes = (bench.groupBy("bench_doc_id")
                   .agg(F.count("*").alias("n_bench")))
    corpus = ng.where(~is_bench)
    return (corpus
            .join(F.broadcast(bench), "g")
            .groupBy("doc_id", "bench_doc_id")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= MIN_SHARED)
            .join(F.broadcast(bench_sizes), "bench_doc_id")
            .select("doc_id", "bench_doc_id", "n_shared",
                    F.round(F.col("n_shared") / F.col("n_bench"),
                            6).alias("overlap_ratio"),
                    (F.col("n_shared") >= CONTAM_THRESHOLD)
                    .alias("contaminated")))


DECONTAMINATION_ORACLE = f"""
WITH ng AS (
  SELECT doc_id, unnest({_ngrams_sql(N_GRAM)}) AS g FROM documents
),
bench AS (SELECT doc_id AS bench_doc_id, g FROM ng
          WHERE doc_id % {BENCH_MOD} = 0),
bench_sizes AS (SELECT bench_doc_id, count(*) AS n_bench
                FROM bench GROUP BY bench_doc_id),
hits AS (
  SELECT c.doc_id, b.bench_doc_id, count(*) AS n_shared
  FROM ng c JOIN bench b ON c.g = b.g
  WHERE c.doc_id % {BENCH_MOD} <> 0
  GROUP BY c.doc_id, b.bench_doc_id
  HAVING count(*) >= {MIN_SHARED}
)
SELECT h.doc_id, h.bench_doc_id, h.n_shared,
       round(h.n_shared / CAST(s.n_bench AS DOUBLE), 6)
         AS overlap_ratio,
       h.n_shared >= {CONTAM_THRESHOLD} AS contaminated
FROM hits h JOIN bench_sizes s USING (bench_doc_id)
"""


def decontamination_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] the 100 TB twin of :func:`decontamination` — identical
    output, same oracle, but gram TEXT never leaves the row: words are
    xxhash64'ed once, 3-grams combine the three pre-hashed longs with
    one more xxhash64 (the ngramdup recipe — interpreted HOF lambdas
    must be allocation-free, and hashing words once measured 1.7x over
    per-offset concat+string-hash), and the broadcast/candidate join
    carries 8-byte hashes instead of ~25-byte gram strings. Engine
    parity is hash-invariant (the oracle joins gram STRINGS): results
    agree unless two distinct grams collide in 64 bits — ~2^-64 per
    pair, verified collision-free on the test corpora (the same
    contract as dup_ngram_fraction)."""
    d = load_table(spark, sf_dir, "documents")
    n_part = max(int(d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")) // 2, 8)
    # fan out the one-split local file before the ~250x explode
    # (ngramdup rationale; at 100 TB the input has thousands of
    # splits and this repartition is the step you delete)
    d = (d.repartition(n_part, "doc_id")
         .select("doc_id", F.split(F.trim("text"), " ").alias("ws")))
    wh = F.transform("ws", lambda w: F.xxhash64(w))
    staged = d.select("doc_id", wh.alias("wh"))
    grams = F.array_distinct(F.transform(
        F.when(F.size("wh") >= N_GRAM,
               F.sequence(F.lit(1), F.size("wh") - (N_GRAM - 1)))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.xxhash64(*[F.element_at("wh", i + j)
                               for j in range(N_GRAM)])))
    ng = staged.select("doc_id", F.explode(grams).alias("gh"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = (ng.where(is_bench)
             .select(F.col("doc_id").alias("bench_doc_id"), "gh")
             .localCheckpoint())
    bench_sizes = (bench.groupBy("bench_doc_id")
                   .agg(F.count("*").alias("n_bench")))
    corpus = ng.where(~is_bench)
    return (corpus
            .join(F.broadcast(bench), "gh")
            .groupBy("doc_id", "bench_doc_id")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= MIN_SHARED)
            .join(F.broadcast(bench_sizes), "bench_doc_id")
            .select("doc_id", "bench_doc_id", "n_shared",
                    F.round(F.col("n_shared") / F.col("n_bench"),
                            6).alias("overlap_ratio"),
                    (F.col("n_shared") >= CONTAM_THRESHOLD)
                    .alias("contaminated")))
