"""Distribution-matching data selection: a hashed-feature Naive Bayes
document classifier and DSIR-style importance weighting (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling").

Production LLM pipelines select training data by comparing a RAW
corpus distribution against a TARGET distribution — either through a
trained quality/domain classifier (the GPT-3/PaLM "quality filter")
or through hashed n-gram importance weights (DSIR). Both reduce to
the same Spark-first skeleton, which is why they share this module:

1. featurize each word into a SMALL hashed bucket space (md5-prefix
   arithmetic — engine-portable, unlike xxhash64 which DuckDB lacks);
2. reduce the corpus to a BUCKET-SIZED sufficient-statistics model
   with one map-side-combined groupBy (64 x |classes| rows for NB,
   256 rows for DSIR) — never iterate, never collect corpus rows;
3. broadcast the model and score documents with one equi-join plus a
   per-document partial aggregation (the only corpus-sized shuffle,
   and it carries (doc, bucket) partials, not words);
4. select: per-doc argmax for the classifier (min-struct, no window),
   deterministic top-K for DSIR (TakeOrdered, no global sort).

Float parity contract: per-(doc, class) scores are sums of <=
|buckets| double terms, so cross-engine association-order error is
~1e-12 while scores are rounded at 1e-6 and separated by O(0.1) —
the same margin argument the lm_doc_scores family has held green
since round 5. Argmax and top-K both rank the ROUNDED score with a
total deterministic tie-break (class name / doc_id).

Reference parity: no classifier or sampler exists in the reference
(unit = table/column); north-star extension per SURVEY.md §1.2/§7.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

NB_BUCKETS = 64       # classifier feature space (V for Laplace)
DSIR_BUCKETS = 256    # importance-weight feature space
DSIR_TARGET_LANG = "en"
DSIR_TOP_K = 200

_HEX = "0123456789abcdef"


def _bucket(col: Column, n_buckets: int) -> Column:
    """Word -> hashed bucket in [0, n_buckets): the first md5 byte.
    ONE md5 + one substring + one base-16 conv (the first cut decoded
    the two hex chars with two instr probes over two md5 calls —
    measured 2x the hash work in the corpus-scan stage). The DuckDB
    oracle mirrors the same byte with strpos arithmetic over the hex
    alphabet — both engines emit lowercase-hex md5 of the UTF-8
    bytes, so the value is identical either way."""
    b = F.conv(F.substring(F.md5(col), 1, 2), 16, 10).cast("int")
    return (b % n_buckets).cast("int")


def _bucket_sql(word_expr: str, n_buckets: int) -> str:
    return (f"((strpos('{_HEX}', substr(md5({word_expr}), 1, 1)) - 1) "
            f"* 16 + strpos('{_HEX}', substr(md5({word_expr}), 2, 1)) "
            f"- 1) % {n_buckets}")


def _doc_bucket_counts(spark: SparkSession, sf_dir: str,
                       n_buckets: int) -> DataFrame:
    """(doc_id, lang, b, n): per-document bucket histograms — the
    SUFFICIENT STATISTICS both selectors score from, reduced
    immediately after the word explode so the corpus-sized word frame
    never materializes (<= n_buckets rows per document survive; the
    groupBy partial-aggregates map-side). Whitespace tokenization per
    the decontam/spandedup convention (split of an empty text yields
    one '' token in both engines, so every document has >= 1 feature
    row by construction — no empty-doc special case downstream).
    localCheckpointed: both consumers scan it 2-4x and the pinned
    input keeps model and scoring views consistent by construction."""
    d = load_table(spark, sf_dir, "documents")
    n_part = int(d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    # local fan-out of the few-split test file so the explode+hash
    # stage uses every core (the spandedup/decontam rationale; at
    # 100 TB the source has thousands of splits and this is deleted)
    d = d.repartition(n_part, "doc_id")
    return (d.select("doc_id", "lang",
                     F.explode(F.split(F.trim("text"), r"\s+"))
                     .alias("w"))
            .groupBy("doc_id", "lang",
                     _bucket(F.col("w"), n_buckets).alias("b"))
            .agg(F.count("*").alias("n"))
            .localCheckpoint())


# ---------------------------------------------------------------------------
# hashed-feature Naive Bayes language classifier
# ---------------------------------------------------------------------------

def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (doc_id, lang, pred_lang, best_score, correct): multinomial
    Naive Bayes over md5-bucketed word features, trained on the even
    doc_ids and scored on the odd ones (the train/score split every
    quality-classifier pipeline needs; priors and Laplace-smoothed
    likelihoods both come from the train half only).

    score(d, c) = ln(docs_c / docs) + sum_b n_db * ln((cnt_cb + 1) /
    (tot_c + V)); pred = argmax over ROUNDED score, ties to the
    lexicographically smallest class. The model is |classes| x V =
    ~320 rows — built by one map-side-combined groupBy, broadcast to
    the scoring join; the per-(doc, class) aggregation is the only
    corpus-sized shuffle."""
    dbc = _doc_bucket_counts(spark, sf_dir, NB_BUCKETS)
    train = dbc.where(F.col("doc_id") % 2 == 0)

    # priors from train DOC counts; class word totals for smoothing
    tr_docs = (train.select("doc_id", "lang").distinct()
               .groupBy("lang").agg(F.count("*").alias("nd")))
    n_train = tr_docs.agg(F.sum("nd").alias("n"))
    prior = (tr_docs.crossJoin(F.broadcast(n_train))
             .select(F.col("lang").alias("cls"),
                     F.log(F.col("nd") / F.col("n")).alias("logprior")))
    cls_tot = (train.groupBy("lang")
               .agg(F.sum("n").alias("tot"))
               .select(F.col("lang").alias("cls"), "tot"))
    cnt = (train.groupBy("lang", "b").agg(F.sum("n").alias("n"))
           .select(F.col("lang").alias("cls"), "b", "n"))
    grid = (cls_tot.crossJoin(
        spark.range(NB_BUCKETS).select(F.col("id").cast("int")
                                       .alias("b"))))
    lik = (grid.join(cnt, ["cls", "b"], "left")
           .select("cls", "b",
                   F.log((F.coalesce("n", F.lit(0)) + 1)
                         / (F.col("tot") + NB_BUCKETS)
                         .cast("double")).alias("logp")))

    test = (dbc.where(F.col("doc_id") % 2 == 1)
            .select("doc_id", "b", "n"))
    scored = (test.join(F.broadcast(lik), "b")
              .groupBy("doc_id", "cls")
              .agg(F.sum(F.col("n") * F.col("logp")).alias("s"))
              .join(F.broadcast(prior.select("cls", "logprior")),
                    "cls")
              .select("doc_id", "cls",
                      F.round(F.col("s") + F.col("logprior"), 6)
                      .alias("rscore")))
    best = (scored.groupBy("doc_id")
            .agg(F.min(F.struct((-F.col("rscore")).alias("ns"),
                                F.col("cls").alias("c"))).alias("m"))
            .select("doc_id", F.col("m.c").alias("pred_lang"),
                    (-F.col("m.ns")).alias("best_score")))
    actual = (load_table(spark, sf_dir, "documents")
              .where(F.col("doc_id") % 2 == 1)
              .select("doc_id", "lang"))
    return (actual.join(best, "doc_id")
            .select("doc_id", "lang", "pred_lang", "best_score",
                    (F.col("lang") == F.col("pred_lang"))
                    .alias("correct")))


NB_LANG_CLASSIFIER_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
),
wb AS (
  SELECT doc_id, lang,
         {_bucket_sql('w', NB_BUCKETS)} AS b
  FROM w
),
tr AS (SELECT * FROM wb WHERE doc_id % 2 = 0),
prior AS (
  SELECT lang AS cls, count(*) AS nd
  FROM (SELECT DISTINCT doc_id, lang FROM tr)
  GROUP BY lang
),
ntr AS (SELECT sum(nd) AS n FROM prior),
cls_tot AS (SELECT lang AS cls, count(*) AS tot FROM tr GROUP BY lang),
cnt AS (SELECT lang AS cls, b, count(*) AS n FROM tr GROUP BY 1, 2),
grid AS (
  SELECT c.cls, c.tot, CAST(t.b AS INTEGER) AS b
  FROM cls_tot c, UNNEST(range(0, {NB_BUCKETS})) AS t(b)
),
lik AS (
  SELECT g.cls, g.b,
         ln((coalesce(cnt.n, 0) + 1)
            / CAST(g.tot + {NB_BUCKETS} AS DOUBLE)) AS logp
  FROM grid g LEFT JOIN cnt ON cnt.cls = g.cls AND cnt.b = g.b
),
te AS (
  SELECT doc_id, b, count(*) AS n FROM wb
  WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
sc AS (
  SELECT te.doc_id, l.cls, sum(te.n * l.logp) AS s
  FROM te JOIN lik l USING (b) GROUP BY 1, 2
),
tot AS (
  SELECT sc.doc_id, sc.cls,
         round(sc.s + ln(p.nd / CAST((SELECT n FROM ntr) AS DOUBLE)),
               6) AS rscore
  FROM sc JOIN prior p ON p.cls = sc.cls
),
best AS (
  SELECT doc_id, cls, rscore,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY rscore DESC, cls ASC) AS rn
  FROM tot
)
SELECT b.doc_id, d.lang, b.cls AS pred_lang, b.rscore AS best_score,
       (d.lang = b.cls) AS correct
FROM best b
JOIN (SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1) d
  USING (doc_id)
WHERE b.rn = 1
"""


# ---------------------------------------------------------------------------
# DSIR importance weighting
# ---------------------------------------------------------------------------

def dsir_importance_weights(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """[Q] (doc_id, lang, n_words, log_weight): the DSIR selection —
    per-document hashed-feature log importance weight
    sum_w [ln p_target(b(w)) - ln p_raw(b(w))] with Laplace-smoothed
    bucket distributions (target = the DSIR_TARGET_LANG slice,
    raw = the whole corpus), returning the TOP_K documents by
    (rounded weight DESC, doc_id ASC) — the deterministic stand-in
    for DSIR's Gumbel resampling step.

    Scale shape: the weight model is DSIR_BUCKETS rows (two map-side
    combined bucket aggs -> one broadcast table); scoring is one
    broadcast join over (doc, bucket) partials + a per-doc sum; the
    top-K is a TakeOrdered, never a global sort."""
    dbc = _doc_bucket_counts(spark, sf_dir, DSIR_BUCKETS)
    raw = dbc.groupBy("b").agg(F.sum("n").alias("nr"))
    tgt = (dbc.where(F.col("lang") == DSIR_TARGET_LANG)
           .groupBy("b").agg(F.sum("n").alias("nt")))
    tot = (dbc.agg(F.sum("n").alias("tr"),
                   F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG,
                                F.col("n")).otherwise(0)).alias("tt")))
    lam = (spark.range(DSIR_BUCKETS)
           .select(F.col("id").cast("int").alias("b"))
           .join(raw, "b", "left").join(tgt, "b", "left")
           .crossJoin(F.broadcast(tot))
           .select("b", (F.log((F.coalesce("nt", F.lit(0)) + 1)
                               / (F.col("tt") + DSIR_BUCKETS)
                               .cast("double"))
                         - F.log((F.coalesce("nr", F.lit(0)) + 1)
                                 / (F.col("tr") + DSIR_BUCKETS)
                                 .cast("double"))).alias("lam")))
    perdoc = (dbc
              .join(F.broadcast(lam), "b")
              .groupBy("doc_id", "lang")
              .agg(F.sum("n").alias("n_words"),
                   F.round(F.sum(F.col("n") * F.col("lam")), 6)
                   .alias("log_weight")))
    return (perdoc
            .orderBy(F.desc("log_weight"), F.asc("doc_id"))
            .limit(DSIR_TOP_K))


DSIR_IMPORTANCE_WEIGHTS_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
),
wb AS (
  SELECT doc_id, lang,
         {_bucket_sql('w', DSIR_BUCKETS)} AS b
  FROM w
),
tot AS (
  SELECT count(*) AS tr,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
           AS tt
  FROM wb
),
raw AS (SELECT b, count(*) AS nr FROM wb GROUP BY b),
tgt AS (
  SELECT b, count(*) AS nt FROM wb
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
),
lam AS (
  SELECT CAST(g.b AS INTEGER) AS b,
         ln((coalesce(tgt.nt, 0) + 1)
            / CAST(tot.tt + {DSIR_BUCKETS} AS DOUBLE))
         - ln((coalesce(raw.nr, 0) + 1)
              / CAST(tot.tr + {DSIR_BUCKETS} AS DOUBLE)) AS lam
  FROM UNNEST(range(0, {DSIR_BUCKETS})) AS g(b)
  LEFT JOIN raw ON raw.b = g.b
  LEFT JOIN tgt ON tgt.b = g.b
  CROSS JOIN tot
),
perdoc AS (
  SELECT wb.doc_id, wb.lang,
         CAST(count(*) AS BIGINT) AS n_words,
         round(sum(lam.lam), 6) AS log_weight
  FROM wb JOIN lam USING (b)
  GROUP BY wb.doc_id, wb.lang
)
SELECT doc_id, lang, n_words, log_weight
FROM perdoc
ORDER BY log_weight DESC, doc_id ASC
LIMIT {DSIR_TOP_K}
"""
