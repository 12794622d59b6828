"""Deterministic stratified / quota sampling for corpus balancing.

A training-data pipeline rarely takes a corpus whole: it draws a fixed
fraction (or quota) per stratum — language, source domain, quality band —
so the mixture matches a target composition. The classic trap at 100 TB
is `ORDER BY random() LIMIT n` per group: a global sort and a
non-reproducible sample. Instead we rank rows inside each stratum by a
deterministic content hash (md5 of the key), so:

* the sample is reproducible run-to-run and engine-to-engine (the DuckDB
  oracle computes the identical md5 ordering);
* the only shuffle is one hash-partitioned window over the stratum key —
  per-group top-N, never a global sort;
* quota arithmetic (ceil of fraction x group size) happens in-plan via a
  count() window over the same partition — no second scan, no driver
  round-trip.

At 100 TB the stratum count is tiny (languages x sources) while strata
are huge; the window shuffle hash-partitions on (lang, source) which can
skew when one stratum dominates. The md5 rank only needs per-stratum
top-N, so AQE skew-split handles long strata; if a single stratum is
pathologically large, pre-aggregate quotas from table statistics and
replace the window with a `WHERE md5 < threshold` scan (documented
escape hatch, not needed at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

SAMPLE_FRAC = 0.2


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] deterministic 20% quota sample per (lang, source) stratum.

    Returns (doc_id, lang, source, stratum_n, sample_rank) for sampled
    docs: rank = md5-order position inside the stratum, stratum_n = the
    stratum's total row count, quota = ceil(0.2 * stratum_n).

    Plan (the r3-verdict trim): instead of rank-sorting every stratum
    in full, rows are pre-filtered by a seeded THRESHOLD on the same
    md5 ordering key — ``hfrac < margin`` where hfrac is the leading
    8 hex chars of the key as a uniform [0,1) and margin is the quota
    fraction plus a 6-sigma Chernoff cushion (+16/n so small strata
    keep everything). Because hfrac is a monotone prefix of the string
    ordering key, the kept set is EXACTLY a prefix of each stratum's
    md5 order, so ranks computed inside it equal full-stratum ranks.
    The window shuffle+sort therefore carries ~frac of the corpus, not
    all of it. Strata where the cushion still under-delivered (<quota
    kept; probability ~1e-9 per stratum, but nonzero) are detected
    from the stratum-sized count frames and re-ranked in full via a
    top-up branch — output is hash-identical to the naive full rank at
    every SF, by construction, not by luck."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    quota = F.ceil(F.lit(SAMPLE_FRAC) * F.col("stratum_n"))
    counts = (d.groupBy("lang", "source")
              .agg(F.count("*").alias("stratum_n")))
    base = (d.select("doc_id", "lang", "source")
            .join(F.broadcast(counts), ["lang", "source"]))
    hfrac = (F.conv(F.substring(key, 1, 8), 16, 10).cast("double")
             / F.lit(float(16 ** 8)))
    margin = F.least(
        F.lit(1.0),
        F.lit(SAMPLE_FRAC)
        + F.lit(6.0) * F.sqrt(F.lit(SAMPLE_FRAC) / F.col("stratum_n"))
        + F.lit(16.0) / F.col("stratum_n"))
    pre = base.where(hfrac < margin)
    w = (Window.partitionBy("lang", "source")
         .orderBy(key.asc(), F.col("doc_id").asc()))

    def _ranked(frame: DataFrame) -> DataFrame:
        return (frame.select(
            "doc_id", "lang", "source", "stratum_n",
            F.row_number().over(w).cast("int").alias("sample_rank"))
            .where(F.col("sample_rank") <= quota))

    pre_m = pre.groupBy("lang", "source").agg(F.count("*").alias("m"))
    short = (counts.join(pre_m, ["lang", "source"], "left")
             .where(F.coalesce(F.col("m"), F.lit(0)) < quota)
             .select("lang", "source"))
    main = _ranked(pre).join(F.broadcast(short), ["lang", "source"],
                             "left_anti")
    topup = _ranked(base.join(F.broadcast(short), ["lang", "source"]))
    return main.unionByName(topup).select(
        "doc_id", "lang", "source", "stratum_n", "sample_rank")


STRATIFIED_SAMPLE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         count(*) OVER (PARTITION BY lang, source) AS stratum_n,
         CAST(row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS INTEGER) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, source, stratum_n, sample_rank
FROM ranked
WHERE sample_rank <= ceil({SAMPLE_FRAC} * stratum_n)
"""


# target mixture weights per source domain (a training run's data-mix
# recipe); sources absent from the map are excluded from the mix
MIX_WEIGHTS: dict[str, float] = {
    "src0": 0.4,
    "src1": 0.25,
    "src2": 0.2,
    "src3": 0.1,
    "src4": 0.05,
}
MIX_TOTAL_FRAC = 0.3  # sample 30% of the corpus overall


def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] weighted data-mix sampling: draw a deterministic sample whose
    per-source composition follows MIX_WEIGHTS (the training-mixture
    recipe), sized at MIX_TOTAL_FRAC of the corpus.

    Per-source quota = ceil(total_corpus * MIX_TOTAL_FRAC * weight),
    capped by the source's actual size (an under-represented source
    contributes what it has — the standard mixture shortfall rule).
    Selection inside a source is the same md5-rank idiom as
    stratified_sample: reproducible, one window shuffle on source,
    no global sort. The corpus total rides the same window pass as a
    size-1 broadcast join (count over an empty partition would need a
    second scan; a grouped count + broadcast keeps one scan per side
    at any scale)."""
    d = load_table(spark, sf_dir, "documents")
    weights = F.create_map(*[
        F.lit(x) for kv in sorted(MIX_WEIGHTS.items()) for x in kv])
    total = d.groupBy().agg(F.count("*").alias("corpus_n"))
    key = F.md5(F.col("doc_id").cast("string"))
    per_src = Window.partitionBy("source")
    w = per_src.orderBy(key.asc(), F.col("doc_id").asc())
    ranked = (d.select("doc_id", "lang", "source",
                       F.count("*").over(per_src).alias("source_n"),
                       F.row_number().over(w).cast("int")
                       .alias("mix_rank"))
              .withColumn("weight", weights[F.col("source")])
              .where(F.col("weight").isNotNull())
              .crossJoin(F.broadcast(total)))
    quota = F.least(
        F.ceil(F.col("corpus_n") * MIX_TOTAL_FRAC * F.col("weight")),
        F.col("source_n").cast("bigint"))
    return (ranked.where(F.col("mix_rank") <= quota)
            .select("doc_id", "lang", "source", "source_n",
                    F.round("weight", 6).alias("weight"), "mix_rank"))


_MIX_CASES = " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items()))

CORPUS_MIXTURE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         count(*) OVER (PARTITION BY source) AS source_n,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS INTEGER) AS mix_rank,
         CAST(CASE source {_MIX_CASES} END AS DOUBLE) AS weight
  FROM documents
), total AS (SELECT count(*) AS corpus_n FROM documents)
SELECT doc_id, lang, source, source_n,
       round(weight, 6) AS weight, mix_rank
FROM ranked, total
WHERE weight IS NOT NULL
  AND mix_rank <= least(ceil(CAST(corpus_n AS DOUBLE)
                             * CAST({MIX_TOTAL_FRAC} AS DOUBLE)
                             * weight),
                        source_n)
"""


# --- temperature-scaled mixture (the multilingual rebalancing knob) -----

MIX_ALPHA = 0.7  # sampling prob ~ w^alpha; alpha < 1 flattens


def _temp_weights() -> dict[str, float]:
    """w_i^alpha, renormalized — computed ONCE in Python so both
    engines receive the identical double literals (no cross-engine pow
    evaluation to diverge). alpha < 1 flattens the mixture toward
    low-resource sources (the standard multilingual rebalancing,
    often written p^(1/T) with T > 1)."""
    raw = {s: w ** MIX_ALPHA for s, w in MIX_WEIGHTS.items()}
    z = sum(raw[s] for s in sorted(raw))
    return {s: raw[s] / z for s in sorted(raw)}


def corpus_mixture_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] corpus_mixture with temperature-flattened weights
    (w^0.7 renormalized): same md5-rank plan, quotas drawn from the
    flattened distribution.
    Output adds the effective weight so the rebalancing is auditable."""
    d = load_table(spark, sf_dir, "documents")
    tw = _temp_weights()
    weights = F.create_map(*[
        F.lit(x) for kv in sorted(tw.items()) for x in kv])
    total = d.groupBy().agg(F.count("*").alias("corpus_n"))
    key = F.md5(F.col("doc_id").cast("string"))
    per_src = Window.partitionBy("source")
    w = per_src.orderBy(key.asc(), F.col("doc_id").asc())
    ranked = (d.select("doc_id", "lang", "source",
                       F.count("*").over(per_src).alias("source_n"),
                       F.row_number().over(w).cast("int")
                       .alias("mix_rank"))
              .withColumn("weight", weights[F.col("source")])
              .where(F.col("weight").isNotNull())
              .crossJoin(F.broadcast(total)))
    quota = F.least(
        F.ceil(F.col("corpus_n") * MIX_TOTAL_FRAC * F.col("weight")),
        F.col("source_n").cast("bigint"))
    return (ranked.where(F.col("mix_rank") <= quota)
            .select("doc_id", "lang", "source", "source_n",
                    F.round("weight", 6).alias("weight"), "mix_rank"))


def _temp_cases() -> str:
    return " ".join(f"WHEN '{s}' THEN {w!r}"
                    for s, w in sorted(_temp_weights().items()))


CORPUS_MIXTURE_TEMP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         count(*) OVER (PARTITION BY source) AS source_n,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS INTEGER) AS mix_rank,
         CAST(CASE source {_temp_cases()} END AS DOUBLE) AS weight
  FROM documents
), total AS (SELECT count(*) AS corpus_n FROM documents)
SELECT doc_id, lang, source, source_n,
       round(weight, 6) AS weight, mix_rank
FROM ranked, total
WHERE weight IS NOT NULL
  AND mix_rank <= least(ceil(CAST(corpus_n AS DOUBLE)
                             * CAST({MIX_TOTAL_FRAC} AS DOUBLE)
                             * weight),
                        source_n)
"""


# --- weighted sampling without replacement (Efraimidis–Spiridonov A-ES)

WSAMPLE_N = 50
_U_DENOM = float(16 ** 13)  # 2^52 — exact in double


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] deterministic weighted sample without replacement: the A-ES
    scheme draws item i with key e_i = -ln(u_i) / w_i and keeps the N
    smallest keys — equivalent to sequential draws proportional to w
    without replacement. Here w = n_chars (longer docs proportionally
    more likely) and u is a seeded uniform from the md5 of doc_id, so
    the sample is reproducible run-to-run and engine-to-engine.

    Plan: the key is a NARROW projection (no shuffle); the N smallest
    keys are a ``TakeOrderedAndProject`` (each partition ships only its
    local top N) — the same no-global-sort shape as the cosine top-k.
    At 100 TB this is one scan + one N-row exchange.

    Keys are rounded to 9 decimals BEFORE ranking with doc_id as the
    tie-break, so a last-ulp ln() divergence between engines cannot
    reorder the sample.
    """
    d = load_table(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            1, 13), 16, 10).cast("double")
         / F.lit(_U_DENOM))
    # clamp u away from 0 (an all-zero 13-hex prefix, p ~ 2^-52/doc):
    # Spark log(0) is NULL (sorts FIRST asc) while DuckDB ln(0) is
    # -inf (key +inf, sorts last) — the engines would disagree on
    # that doc. 2^-52 is the smallest NONZERO u, so the clamp merges
    # u=0 into its neighbor identically in both engines.
    u = F.greatest(u, F.lit(2.0 ** -52))
    e = F.round(-F.log(u) / F.col("n_chars"), 9)
    keyed = d.select("doc_id", "source",
                     F.col("n_chars").alias("weight"),
                     e.alias("es_key"))
    top = keyed.orderBy(F.asc("es_key"), F.asc("doc_id")).limit(WSAMPLE_N)
    w = Window.orderBy(F.asc("es_key"), F.asc("doc_id"))
    return (top.withColumn("ws_rank",
                           F.row_number().over(w).cast("int"))
            .select("doc_id", "source", "weight", "es_key", "ws_rank"))


WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars AS weight,
         round(-ln(greatest(
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                  AS BIGINT) / {_U_DENOM!r},
             {2.0 ** -52!r}))
           / n_chars, 9) AS es_key
  FROM documents
)
SELECT doc_id, source, weight, es_key,
       CAST(ws_rank AS INTEGER) AS ws_rank
FROM (SELECT *, row_number() OVER (ORDER BY es_key ASC, doc_id ASC)
        AS ws_rank
      FROM keyed)
WHERE ws_rank <= {WSAMPLE_N}
"""


# ---------------------------------------------------------------------------
# deterministic training-shard shuffle (round 10)
# ---------------------------------------------------------------------------

N_SHARDS = 32
SHUFFLE_SEED = 42
_HEXD = "0123456789abcdef"


def _shard_hash():
    """32-bit seeded content hash: first 8 md5 hex chars of
    'doc_id:seed'. md5-prefix (not xxhash64) so the DuckDB oracle
    reproduces the identical ordering; 32-bit collisions are harmless
    because every ordering below ties-breaks on doc_id."""
    return F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                          F.lit(str(SHUFFLE_SEED)))), 1, 8),
        16, 10).cast("long")


def training_shard_shuffle(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """[Q] (doc_id, shard, pos): the pipeline's LAST step —
    deterministic global shuffle of the corpus into N_SHARDS training
    shards with a reproducible intra-shard order. shard = h % N,
    pos = rank of (h, doc_id) inside the shard, h = seeded 32-bit
    content hash, so the 'random' order is reproducible run-to-run,
    engine-to-engine, and under any partitioning.

    Scale shape: NO global sort anywhere — the plan is one Exchange
    hash-partitioned on `shard` and N INDEPENDENT in-partition sorts
    (the window's partitionBy is the shard key). Shard count is the
    parallelism knob: production uses 10k-100k shards so each shard
    sorts inside one task's spill budget; the demo pins N_SHARDS=32.
    A seed change is a free full reshuffle (new epoch order) with
    zero code path changes."""
    d = load_table(spark, sf_dir, "documents")
    h = _shard_hash()
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (d.select("doc_id", h.alias("h"))
            .withColumn("shard", (F.col("h") % N_SHARDS).cast("int"))
            .select("doc_id", "shard",
                    F.row_number().over(w).alias("pos")))


def _hex8_sql(expr: str) -> str:
    """DuckDB mirror of the 8-hex-char prefix decode."""
    terms = " + ".join(
        f"(strpos('{_HEXD}', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}" for i in range(8))
    return f"({terms})"


TRAINING_SHARD_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         {_hex8_sql(f"doc_id || ':{SHUFFLE_SEED}'")} AS h
  FROM documents
)
SELECT doc_id, CAST(h % {N_SHARDS} AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {N_SHARDS}
                               ORDER BY h, doc_id) AS INTEGER) AS pos
FROM h
"""


# ---------------------------------------------------------------------------
# token-balanced contiguous sharding (round 11): the count-balanced
# twin above (training_shard_shuffle) gives every shard ~n/N documents;
# heterogeneous doc lengths then skew TOKEN mass per shard by the
# length variance, and token mass — not doc count — is what sizes a
# training step. This operator cuts the SAME deterministic (h, doc_id)
# shuffle order into N contiguous ranges of ~equal token mass.
# ---------------------------------------------------------------------------


def token_balanced_shards(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """[Q] (doc_id, shard, n_tokens, cum_before): shard k holds the
    docs whose running token total (exclusive, in seeded-hash order)
    falls in [k*width, (k+1)*width), width = ceil(total/N) — every
    shard within one document of equal token mass, reproducible
    run-to-run and engine-to-engine.

    Scale shape: NO global window. The frame range-partitions on the
    seeded (h, doc_id) order and sorts within partitions; one
    _RANK_PARTS-row driver collect of ACTUAL per-partition token sums
    yields exact partition offsets; the running sum inside each
    partition is an Arrow kernel that streams the partition's batches
    in order (mapInPandas generator — state crosses batches within a
    task, never between tasks), so the only corpus-sized exchange is
    the range partition itself. The same recipe as
    functions/ranking.py distributed_ntile with a SUM instead of a
    COUNT; a no-partition SQL window here would plan the
    SinglePartition exchange that recipe exists to avoid."""
    import pandas as pd

    from gcp_datalake_utils_spark.functions.ranking import _RANK_PARTS
    from gcp_datalake_utils_spark.llm.text import token_stats

    toks = token_stats(spark, sf_dir).select("doc_id", "n_tokens")
    keyed = (toks.withColumn("h", _shard_hash())
             .select("doc_id", "h", "n_tokens"))
    ranked = (keyed.repartitionByRange(_RANK_PARTS, "h", "doc_id")
              .sortWithinPartitions("h", "doc_id")
              .withColumn("_mid", F.monotonically_increasing_id())
              .localCheckpoint())
    stats = (ranked
             .groupBy(F.shiftright("_mid", 33).cast("int").alias("_p"))
             .agg(F.sum("n_tokens").alias("s"))
             .collect())
    sums = {r["_p"]: r["s"] for r in stats}
    total = sum(sums.values())
    width = max(1, (total + N_SHARDS - 1) // N_SHARDS)
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    def cumsum(batches):
        run = None
        for pdf in batches:
            if not len(pdf):
                continue
            if run is None:  # first batch of THIS task's partition
                run = offsets[int(pdf["_mid"].iloc[0]) >> 33]
            cum = pdf["n_tokens"].cumsum() + run - pdf["n_tokens"]
            run += int(pdf["n_tokens"].sum())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "n_tokens": pdf["n_tokens"],
                                "cum_before": cum.astype("int64")})

    out = ranked.mapInPandas(
        cumsum, "doc_id long, n_tokens long, cum_before long")
    shard = F.least(F.lit(N_SHARDS - 1),
                    F.floor(F.col("cum_before") / F.lit(width)))
    return out.select("doc_id", shard.cast("int").alias("shard"),
                      "n_tokens", "cum_before")


def _token_balanced_oracle() -> str:
    from gcp_datalake_utils_spark.llm.text import TOKEN_STATS_ORACLE
    return f"""
WITH stats AS ({TOKEN_STATS_ORACLE}),
j AS (
  SELECT s.doc_id,
         {_hex8_sql(f"s.doc_id || ':{SHUFFLE_SEED}'")} AS h,
         s.n_tokens
  FROM stats s
),
tot AS (SELECT sum(n_tokens) AS total FROM j),
o AS (
  SELECT doc_id, h, n_tokens,
         sum(n_tokens) OVER (ORDER BY h, doc_id) - n_tokens
           AS cum_before
  FROM j
)
SELECT o.doc_id,
       CAST(least({N_SHARDS - 1},
                  cum_before // greatest(1, (t.total + {N_SHARDS - 1})
                                            // {N_SHARDS}))
            AS INTEGER) AS shard,
       CAST(o.n_tokens AS BIGINT) AS n_tokens,
       CAST(o.cum_before AS BIGINT) AS cum_before
FROM o, tot t
"""
