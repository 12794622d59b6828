"""Domain/URL-level curation (round 9, r8 verdict ask #7): the
Common-Crawl-shaped operators a web-scale training pipeline runs ABOVE
document granularity — per-host quota sampling, domain quality priors
joined back onto documents, and per-domain dedup rollups.

The testdata documents table carries no URL, so a deterministic
synthetic domain is derived from ``doc_id`` with integer-only
arithmetic both engines evaluate bit-identically (the same pattern as
the corpus's ``source`` column, which is ``'src' || doc_id % 7``). The
derivation is intentionally SKEWED — ``(doc_id % 64) & (doc_id div 64
% 64)`` concentrates ~18% of all docs on domain 0 with a long tail —
so the operators face the hot-host distribution real crawls have,
and the quota sampler's skew handling is exercised, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

# bitwise AND of two uniform 6-bit fields: value v occurs with
# probability 3^(6-popcount(v))/4^6 — domain 'd0' carries ~17.8% of
# the corpus, the tail decays geometrically. Spark `div` == DuckDB `//`
# (integer division); `&` is int64 in both.
_DOMAIN_SPARK = "concat('d', (doc_id % 64) & (doc_id div 64 % 64))"
_DOMAIN_DUCK = "concat('d', (doc_id % 64) & (doc_id // 64 % 64))"

DOMAIN_CAP = 25          # host cap: keep at most N docs per domain
PRIOR_ALPHA = 0.7        # doc-score weight in the blended prior


def _with_domain(d: DataFrame) -> DataFrame:
    return d.withColumn("domain", F.expr(_DOMAIN_SPARK))


def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (domain, n_docs, n_kept, kept_chars): Common-Crawl-style
    host caps — keep the first DOMAIN_CAP docs per domain by doc_id,
    report how much survived (kept_chars sums n_chars over the KEPT
    docs, so the gate checks membership, not just counts).

    Scale shape — salted two-phase top-N: a single
    row_number-over-domain window puts every doc of the hottest host
    in ONE task (windows get no AQE skew split; at 100 TB a mega-host
    is a straggler). Phase 1 ranks within (salt, domain) — the salt
    spreads a hot domain over 32 keys, the exchange is balanced by
    construction — and prunes to <= CAP rows per (salt, domain); the
    phase-2 exact window then sees <= 32*CAP rows per domain,
    regardless of host size. Same bytes through the first exchange as
    the naive window, no straggler, exact same result (phase-1 keeps a
    superset of the global top-CAP: the true top-CAP of a domain
    always survives every per-salt cut)."""
    d = _with_domain(load_table(spark, sf_dir, "documents")
                     .select("doc_id", "n_chars"))
    stats = d.groupBy("domain").agg(
        F.count("*").alias("n_docs"))
    salted = d.withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(32)))
    w1 = Window.partitionBy("_salt", "domain").orderBy("doc_id")
    pruned = (salted.withColumn("_r", F.row_number().over(w1))
              .where(F.col("_r") <= DOMAIN_CAP).drop("_r", "_salt"))
    w2 = Window.partitionBy("domain").orderBy("doc_id")
    kept = (pruned.withColumn("_r", F.row_number().over(w2))
            .where(F.col("_r") <= DOMAIN_CAP))
    kept_agg = kept.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"))
    return (stats.join(kept_agg, "domain")
            .select("domain", "n_docs", "n_kept", "kept_chars"))


DOMAIN_QUOTA_SAMPLE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars, {_DOMAIN_DUCK} AS domain FROM documents
),
r AS (
  SELECT domain, n_chars,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
  FROM d
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE rn <= {DOMAIN_CAP}) AS BIGINT)
         AS n_kept,
       CAST(sum(n_chars) FILTER (WHERE rn <= {DOMAIN_CAP}) AS BIGINT)
         AS kept_chars
FROM r GROUP BY domain
"""


def domain_quality_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, domain, doc_score, domain_score, blended): the
    domain-level quality rollup joined back as a doc-level prior —
    the standard crawl-curation move (a page on a consistently good
    host is trusted above its own score; composes the
    c4_quality_filters signal family with corpus_rollup's
    group-then-join-back shape).

    doc_score is the saturating length signal n_words/(n_words+40);
    domain_score is the POOLED score sum_words/(sum_words+40*n_docs)
    — computed from exact integer sums, so it is order-independent
    and hash-stable across engines (a double avg() of per-doc scores
    would not be); blended = ALPHA*doc + (1-ALPHA)*domain, rounded
    once at the end. Scale: one narrow tokenize scan, one
    domain-cardinality rollup, one join back on domain (broadcast at
    this cardinality; a plain partial-aggregated hash join at web
    scale — stated so the plan is honest about 1e8 hosts)."""
    from gcp_datalake_utils_spark.llm.text import _words_col
    d = _with_domain(load_table(spark, sf_dir, "documents")
                     .select("doc_id", "text"))
    t = d.select("doc_id", "domain",
                 F.size(_words_col()).cast("long").alias("nw"))
    dom = (t.groupBy("domain")
           .agg(F.sum("nw").alias("sw"),
                F.count("*").alias("nd")))
    dom_score = (F.col("sw").cast("double")
                 / (F.col("sw") + 40 * F.col("nd")))
    doc_score = F.col("nw").cast("double") / (F.col("nw") + 40)
    return (t.join(F.broadcast(dom.select(
                "domain", dom_score.alias("ds"))), "domain")
            .select("doc_id", "domain",
                    F.round(doc_score, 6).alias("doc_score"),
                    F.round("ds", 6).alias("domain_score"),
                    F.round(PRIOR_ALPHA * doc_score
                            + (1 - PRIOR_ALPHA) * F.col("ds"), 6)
                    .alias("blended")))


DOMAIN_QUALITY_PRIOR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_DOMAIN_DUCK} AS domain,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS nw
  FROM documents
),
dom AS (
  SELECT domain,
         CAST(sum(nw) AS DOUBLE)
           / (sum(nw) + 40 * count(*)) AS ds
  FROM t GROUP BY domain
)
SELECT t.doc_id, t.domain,
       round(CAST(nw AS DOUBLE) / (nw + 40), 6) AS doc_score,
       round(ds, 6) AS domain_score,
       round({PRIOR_ALPHA} * (CAST(nw AS DOUBLE) / (nw + 40))
             + {1 - PRIOR_ALPHA} * ds, 6) AS blended
FROM t JOIN dom ON t.domain = dom.domain
"""


def domain_dedup_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (domain, n_docs, n_unique, dup_ratio, canon_chars):
    per-domain exact-content dedup — the mirror-page pass crawls run
    before any cross-host near-dup work. Groups on (domain,
    md5(text)), keeps the min-doc_id canonical per group, and rolls up
    per domain; canon_chars sums n_chars over CANONICAL docs only, so
    the hash gate checks which doc each group kept.

    Scale: both exchanges key on (domain, text_hash) or domain with
    partial aggregation — a hot host spreads across the hash
    dimension, so no straggler; nothing is all-pairs. This synthetic
    corpus has no exact dupes (random 40-60-word texts), so n_unique
    == n_docs here; the keep-min semantics are pinned by
    tests/test_round9_ops.py on a fixture WITH mirrors."""
    d = _with_domain(load_table(spark, sf_dir, "documents")
                     .select("doc_id", "text", "n_chars"))
    return _dedup_rollup_frame(d)


def _dedup_rollup_frame(d: DataFrame) -> DataFrame:
    groups = (d.groupBy("domain", F.md5("text").alias("h"))
              .agg(F.count("*").alias("g_docs"),
                   F.min(F.struct("doc_id", "n_chars")).alias("canon")))
    return (groups.groupBy("domain")
            .agg(F.sum("g_docs").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_unique"),
                 F.round(1 - F.count("*")
                         / F.sum("g_docs").cast("double"), 6)
                 .alias("dup_ratio"),
                 F.sum(F.col("canon.n_chars")).cast("long")
                 .alias("canon_chars")))


DOMAIN_DEDUP_ROLLUP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, n_chars, {_DOMAIN_DUCK} AS domain
  FROM documents
),
g AS (
  SELECT domain, md5(text) AS h,
         count(*) AS g_docs,
         min({{'doc_id': doc_id, 'n_chars': n_chars}}) AS canon
  FROM d GROUP BY domain, md5(text)
)
SELECT domain,
       CAST(sum(g_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       round(1 - count(*) / CAST(sum(g_docs) AS DOUBLE), 6)
         AS dup_ratio,
       CAST(sum(canon.n_chars) AS BIGINT) AS canon_chars
FROM g GROUP BY domain
"""
