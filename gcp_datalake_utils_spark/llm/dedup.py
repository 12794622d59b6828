"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard
(north-star extension; the scale path for 100 TB corpus dedup).

Pipeline shape (all built-in Column functions, no UDFs):

1. shingle: words -> distinct word-3-gram shingles per doc (narrow)
2. minhash: k independent hashes = md5(seed:shingle), array_min per seed
   (narrow; the k=8 signature is 8 columns, not a driver structure)
3. band: r=2 rows/band -> 4 band keys = md5(mh_2b || mh_2b+1) (narrow)
4. bucket join: candidates = docs sharing any band key — the ONLY
   shuffle, keyed by (band, band_hash); hot buckets are the classic
   skew case, handled by AQE skew-join splitting (session default)
5. verify: exact shingle-Jaccard on candidates only (pair count is
   ~|near-dups|, not |docs|²)

Exact dedup is one groupBy on a normalized-content hash.
SimHash gives a 16-bit locality-sensitive fingerprint (Hamming-style
bucketing alternative), built from per-word md5 bit votes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

K_MINHASH = 8
BANDS = 4  # r = K_MINHASH // BANDS = 2 rows per band
JACCARD_THRESHOLD = 0.8

_WORDS = "string_split(trim(text), ' ')"  # duck side splits on single
# space; spark side uses the same delimiter for parity


def _words():
    return F.split(F.trim("text"), " ")


def _shingles_of(ws: str):
    """Shingle array built from an ALREADY-MATERIALIZED words attribute.

    The column must be a real attribute (staged in its own .select), not
    the raw split() expression: referencing the split inside the lambda
    would re-tokenize the document per shingle position x3 element_ats —
    the same O(len^2) re-inlining that made r2's repetition_flags
    quadratic. CollapseProject keeps the stage because the alias is
    referenced more than once and split() is not collapse-cheap.

    Docs with <3 words must yield an EMPTY shingle array (matching the
    oracle's range(1, greatest(len-1, 1)) -> []); an unguarded
    sequence(1, size-2) would count DOWN to 0 for short docs and
    element_at(words, 0) errors."""
    words = F.col(ws)
    return F.array_distinct(F.transform(
        F.when(F.size(words) >= 3,
               F.sequence(F.lit(1), F.size(words) - 2))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1),
            F.element_at(words, i + 2))))


_SHINGLES_SQL = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len({_WORDS}) - 1, 1)), "
    f"i -> {_WORDS}[i] || ' ' || {_WORDS}[i+1] || ' ' || {_WORDS}[i+2]))")


def content_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, content_md5): the exact-dedup normalization — shared by
    exact_dup_groups and the incremental curation funnel so both
    screens agree byte-for-byte on what "the same document" means."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return d.select("doc_id", F.md5(norm.cast("binary"))
                    .alias("content_md5"))


def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] exact dedup: normalized-content hash groups with canonical
    (min) doc id — the hash-groupBy pattern that scales to any corpus."""
    w = Window.partitionBy("content_md5")
    return (content_hashes(spark, sf_dir)
            .withColumn("group_size",
                        F.count("*").over(w).cast("long"))
            .withColumn("canonical_doc_id", F.min("doc_id").over(w))
            .withColumn("is_duplicate",
                        F.col("doc_id") != F.col("canonical_doc_id")))


EXACT_DUP_ORACLE = """
SELECT doc_id, content_md5,
       CAST(count(*) OVER (PARTITION BY content_md5) AS BIGINT)
         AS group_size,
       min(doc_id) OVER (PARTITION BY content_md5) AS canonical_doc_id,
       doc_id <> min(doc_id) OVER (PARTITION BY content_md5)
         AS is_duplicate
FROM (SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS content_md5
      FROM documents)
"""


def shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s) — one row per distinct word-3-gram shingle. The
    single exploded pass all downstream dedup operators share.

    The raw documents file is small on disk but fans out ~100× on
    explode + hashing, so repartition by doc BEFORE the heavy md5 work —
    otherwise a one-split parquet file serializes the whole pipeline on
    a single core (at 100 TB the input has thousands of splits and the
    repartition is a no-op cost-wise)."""
    d = load_table(spark, sf_dir, "documents")
    n_part = max(int(d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")) // 2, 8)
    return (d.repartition(n_part, "doc_id")
            .select("doc_id", _words().alias("ws"))  # tokenize ONCE
            .select("doc_id", F.explode(_shingles_of("ws")).alias("s")))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] k=8 MinHash signature per document (seeded md5 family).

    Computed as ONE pass over the exploded shingles — 8 `min` aggregates
    in a single partial-aggregated groupBy — rather than 8 array
    traversals per row; docs with <3 words keep a row (null signature)
    via the left join."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(spark, sf_dir)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("s"))))
            .alias(f"mh_{k}") for k in range(K_MINHASH)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return d.select("doc_id").join(sig, "doc_id", "left")


def _minhash_sql(k: int) -> str:
    return (f"list_min(list_transform({_SHINGLES_SQL}, "
            f"s -> md5('{k}:' || s)))")


MINHASH_ORACLE = "SELECT doc_id, " + ", ".join(
    f"{_minhash_sql(k)} AS mh_{k}" for k in range(K_MINHASH)
) + " FROM documents"


def _band_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _band_keys_from_sig(minhash_signatures(spark, sf_dir))


def _band_keys_from_sig(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) from any frame carrying mh_0..mh_{k-1}
    columns — shared by the batch LSH family and the streaming ingest
    screen (whose signatures are row-local HOF projections)."""
    r = K_MINHASH // BANDS
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat(*[F.col(f"mh_{b * r + i}")
                                  for i in range(r)]).cast("binary"))
                 .alias("band_hash"))
        for b in range(BANDS)])
    return (sig.select("doc_id", F.explode(bands).alias("bk"))
            .select("doc_id", F.col("bk.band").alias("band"),
                    F.col("bk.band_hash").alias("band_hash")))


def _band_keys_sql() -> str:
    r = K_MINHASH // BANDS
    branches = []
    for b in range(BANDS):
        concat = " || ".join(f"mh_{b * r + i}" for i in range(r))
        branches.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS band_hash "
            f"FROM sig")
    return "\nUNION ALL\n".join(branches)


def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] LSH bucket occupancy: buckets holding >1 doc are the
    candidate-generating collisions."""
    bk = _band_keys(spark, sf_dir)
    return (bk.groupBy("band", "band_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_doc_id"))
            .where(F.col("n_docs") > 1)
            .select(F.col("band").cast("int").alias("band"),
                    "band_hash", "n_docs", "min_doc_id"))


LSH_BUCKETS_ORACLE = f"""
WITH sig AS ({MINHASH_ORACLE}),
bk AS ({_band_keys_sql()})
SELECT CAST(band AS INTEGER) AS band, band_hash,
       count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM bk GROUP BY band, band_hash HAVING count(*) > 1
"""


def _verify_jaccard(cands: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard >= threshold over candidate pairs only:
    (doc_a, doc_b, jaccard). Shared by the MinHash-LSH and
    prefix-filter candidate generators."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (cands
             .join(sh.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("s", "sa"), "doc_a")
             .join(sh.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("s", "sb"),
                   on=["doc_b"])
             .where(F.col("sa") == F.col("sb"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "na"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "nb"), "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("inter")
                                / (F.col("na") + F.col("nb")
                                   - F.col("inter")), 6))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard"))


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] MinHash-LSH near-duplicate pairs, verified with exact
    shingle-Jaccard >= 0.8. The bucket join generates candidates; the
    verify join runs only over candidates."""
    bk = _band_keys(spark, sf_dir).localCheckpoint()
    a = bk.alias("a")
    b = bk.alias("b")
    cands = (a.join(b, ["band", "band_hash"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    sh = shingle_rows(spark, sf_dir).localCheckpoint()
    return _verify_jaccard(cands, sh)


NEAR_DUP_ORACLE = f"""
WITH sig AS ({MINHASH_ORACLE}),
bk AS ({_band_keys_sql()}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
sh AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""


def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] Near-duplicate GROUPS: connected components over the verified
    LSH pair graph, so an A~B~C chain collapses to one canonical doc even
    when A~C was never a candidate pair.

    Iterative min-label propagation (hash-to-min): each round every
    vertex takes the min label in its closed neighborhood; fixpoint in
    O(component diameter) rounds — near-dup clusters are shallow (a dup
    cluster's diameter is tiny and independent of corpus size), so the
    round count stays small at 100 TB while each round is one shuffle
    keyed by vertex. Each iteration localCheckpoints (lineage would
    otherwise double per round) — the per-round state is just
    (doc_id, label) for docs that have a near-dup, i.e. |pairs|-sized,
    not corpus-sized."""
    # checkpoint the PAIRS before the symmetric union: fwd and bwd are
    # two references to the same expensive LSH+verify subtree, and
    # Spark has no DataFrame-level CSE — without the checkpoint the
    # whole near-dup pipeline executed TWICE to build edges (measured
    # sf10: 212 -> 124 s fresh on this one line)
    pairs = (near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
             .localCheckpoint())
    fwd = pairs.select(F.col("doc_a").alias("src"),
                       F.col("doc_b").alias("dst"))
    edges = fwd.union(
        pairs.select(F.col("doc_b").alias("src"),
                     F.col("doc_a").alias("dst"))).localCheckpoint()
    from pyspark.sql import Observation
    labels = (edges.select(F.col("src").alias("doc_id"))
              .distinct()
              .withColumn("group_id", F.col("doc_id"))
              .localCheckpoint())
    for _ in range(30):  # diameter bound; real clusters converge in ~3
        # closed-neighborhood min with the convergence count riding
        # the checkpoint job as an Observation (the cc_min_label
        # shape) — one job per round instead of two
        prop = (edges.join(labels,
                           edges["src"] == labels["doc_id"])
                .select(F.col("dst").alias("doc_id"), "group_id")
                .groupBy("doc_id")
                .agg(F.min("group_id").alias("_in")))
        obs = Observation()
        new_labels = (labels.withColumnRenamed("group_id", "_old")
                      .join(prop, "doc_id", "left")
                      .select("doc_id",
                              F.least(F.col("_old"),
                                      F.coalesce("_in", F.col("_old")))
                              .alias("group_id"),
                              F.col("_old"))
                      .observe(obs, F.sum(
                          (F.col("group_id") != F.col("_old"))
                          .cast("long")).alias("n_changed"))
                      .select("doc_id", "group_id")
                      .localCheckpoint())
        changed = int(obs.get["n_changed"] or 0)
        labels = new_labels
        if changed == 0:
            break
    w = Window.partitionBy("group_id")
    return (labels
            .withColumn("group_size", F.count("*").over(w).cast("long"))
            .withColumn("is_canonical",
                        F.col("doc_id") == F.col("group_id")))


DEDUP_GROUPS_ORACLE = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({NEAR_DUP_ORACLE}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(v, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.v
)
SELECT v AS doc_id, min(r) AS group_id,
       CAST(count(*) OVER (PARTITION BY min(r)) AS BIGINT) AS group_size,
       v = min(r) AS is_canonical
FROM reach GROUP BY v
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] canonicalization policy over near-dup groups: within each
    connected component keep the highest-quality document (token_stats
    composite score; ties -> lowest doc_id), mark the rest as drops.
    The per-group window partitions on group_id — components are tiny,
    so no skew — and the quality join is |grouped docs|-sized."""
    from gcp_datalake_utils_spark.llm import text as llm_text
    g = dedup_groups(spark, sf_dir).select("doc_id", "group_id")
    q = llm_text.token_stats(spark, sf_dir) \
        .select("doc_id", "quality_score")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id"))
    return (g.join(q, "doc_id")
            .withColumn("keep", F.row_number().over(w) == 1)
            .select("doc_id", "group_id", "quality_score", "keep"))


def _keep_best_oracle() -> str:
    from gcp_datalake_utils_spark.llm import text as llm_text
    return f"""
WITH groups AS MATERIALIZED ({DEDUP_GROUPS_ORACLE}),
stats AS ({llm_text.TOKEN_STATS_ORACLE})
SELECT g.doc_id, g.group_id, s.quality_score,
       row_number() OVER (PARTITION BY g.group_id
                          ORDER BY s.quality_score DESC, g.doc_id) = 1
         AS keep
FROM groups g JOIN stats s USING (doc_id)
"""


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] which sources duplicate each other: verified near-dup pairs
    rolled up by unordered source pair. (src_a, src_b, n_pairs,
    avg_jaccard) with src_a <= src_b — the corpus-composition view of
    near-duplication (a high off-diagonal count means two 'different'
    sources are rehosting the same content; a high diagonal count
    means one source repeats itself).

    Scale shape: the expensive work (LSH banding + candidate verify)
    is the SAME plan as near_dup_pairs; the doc->source lookups are
    hash equi-joins hinted SHUFFLE_HASH — at 100 TB BOTH sides are
    data-scale (the docs projection is the corpus, and a dup-heavy
    corpus makes the verified pair set large too), so neither side may
    be broadcast. The hint also guards the local harness: Spark's
    static estimate for the 54 MB sf10 parquet projection sat under
    the 64 MB broadcast threshold and the resulting driver-side
    HashedRelation build OOMed — measured, not hypothetical. The final
    rollup is an S^2-bounded aggregate."""
    # materialize the verified pairs before composing further joins:
    # the checkpoint hands Catalyst TRUE statistics for the pair set
    # (the raw composed DAG re-plans the verify subtree with static
    # parquet estimates and picks a driver-OOM broadcast at sf10), and
    # it mirrors production, where verified pairs are a persisted
    # artifact downstream jobs consume
    pairs = near_dup_pairs(spark, sf_dir).localCheckpoint()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = docs.select(F.col("doc_id").alias("doc_a"),
                     F.col("source").alias("source_a")).hint("shuffle_hash")
    sb = docs.select(F.col("doc_id").alias("doc_b"),
                     F.col("source").alias("source_b")).hint("shuffle_hash")
    lo = F.least("source_a", "source_b")
    hi = F.greatest("source_a", "source_b")
    # average over exact ppm integers, not doubles: a float SUM is
    # addition-order-dependent across engines/partitionings, while the
    # already-round(6)ed jaccard is integral in millionths — long sums
    # are exact and both engines divide the same two numbers
    ppm = F.round(F.col("jaccard") * 1e6).cast("long")
    return (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .select(lo.alias("src_a"), hi.alias("src_b"),
                    ppm.alias("ppm"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").alias("n_pairs"),
                 F.round(F.sum("ppm")
                         / (F.count("*") * F.lit(1e6)), 6)
                 .alias("avg_jaccard")))


CROSS_SOURCE_DUP_ORACLE = f"""
WITH pairs AS MATERIALIZED ({NEAR_DUP_ORACLE})
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(SUM(CAST(round(p.jaccard * 1e6) AS BIGINT))
             / (count(*) * 1e6), 6) AS avg_jaccard
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2
"""


BATCH_MOD = 10  # doc_id % BATCH_MOD == 0 plays the "incoming batch"


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] incremental admission dedup: the production 100 TB shape.
    A new BATCH (here the deterministic slice doc_id % 10 == 0) is
    checked against the existing CORPUS — nobody re-dedups 100 TB
    corpus x corpus on ingest; the corpus band keys are a precomputed
    index and only batch x corpus candidates are generated. Per batch
    document: is_dup verdict, best-matching corpus doc and its exact
    Jaccard (nulls when no banded candidate verifies).

    Scale shape: the band join is ASYMMETRIC — the batch side is
    ingest-sized (<< corpus), so at scale it broadcasts (or, with the
    corpus index bucketed by (band, band_hash) at write time, the join
    is exchange-free on the corpus side); the verify join again runs
    only over banded candidates; the best-match election is a window
    over batch doc_id — ingest-sized, no skew."""
    is_batch = F.col("doc_id") % BATCH_MOD == 0
    bk = _band_keys(spark, sf_dir).localCheckpoint()
    cands = (bk.where(is_batch).alias("a")
             .join(bk.where(~is_batch).alias("b"), ["band", "band_hash"])
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    sh = shingle_rows(spark, sf_dir).localCheckpoint()
    verified = _verify_jaccard(cands, sh)
    w = Window.partitionBy("doc_a").orderBy(
        F.desc("jaccard"), F.asc("doc_b"))
    best = (verified.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("doc_a").alias("doc_id"),
                    F.col("doc_b").alias("match_doc"), "jaccard"))
    batch = (load_table(spark, sf_dir, "documents")
             .where(is_batch).select("doc_id"))
    return (batch.join(best, "doc_id", "left")
            .select("doc_id", F.col("match_doc").isNotNull().alias("is_dup"),
                    "match_doc", "jaccard"))


DEDUP_INCREMENTAL_ORACLE = f"""
WITH sig AS ({MINHASH_ORACLE}),
bk AS ({_band_keys_sql()}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id % {BATCH_MOD} = 0 AND b.doc_id % {BATCH_MOD} <> 0
),
sh AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT i.doc_a, i.doc_b,
         round(i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE), 6)
           AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)
        >= {JACCARD_THRESHOLD}
),
best AS (
  SELECT doc_a AS doc_id, doc_b AS match_doc, jaccard
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
                                     ORDER BY jaccard DESC, doc_b)
               AS rn
        FROM verified)
  WHERE rn = 1
)
SELECT d.doc_id, best.match_doc IS NOT NULL AS is_dup,
       best.match_doc, best.jaccard
FROM documents d LEFT JOIN best ON best.doc_id = d.doc_id
WHERE d.doc_id % {BATCH_MOD} = 0
"""


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] 16-bit SimHash per document: per-word md5 bits vote ±1, the
    sign vector packs into an int. Hamming-close docs bucket together
    when split into 4-bit chunks (done by consumers)."""
    d = load_table(spark, sf_dir, "documents")
    # stage the hashed-word array as a real attribute: the 16 bit-vote
    # folds below each reference it, and an un-materialized expression
    # would re-split AND re-md5 the whole document 16 times per row
    staged = (d.select("doc_id", _words().alias("ws"))
              .select("doc_id", F.transform(
                  "ws",
                  lambda w: F.conv(F.substring(F.md5(w.cast("binary")),
                                               1, 4),
                                   16, 10).cast("long")).alias("wh")))

    def _bit_vote(b):
        # strict two-parameter merge lambda for F.aggregate
        return lambda acc, h: acc + F.when(
            F.floor(h / (2 ** b)) % 2 == 1, 1).otherwise(-1)

    bits = []
    for b in range(16):
        vote = F.aggregate(F.col("wh"), F.lit(0), _bit_vote(b))
        bits.append((F.when(vote > 0, 2 ** b).otherwise(0)).cast("long"))
    sh = bits[0]
    for x in bits[1:]:
        sh = sh + x
    return staged.select("doc_id", sh.alias("simhash16"))


def _simhash_sql() -> str:
    wh = (f"list_transform({_WORDS}, "
          f"w -> CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT))")
    terms = []
    for b in range(16):
        vote = (f"list_sum(list_transform({wh}, "
                f"h -> CASE WHEN floor(h / {2 ** b}) % 2 = 1 "
                f"THEN 1 ELSE -1 END))")
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2 ** b} ELSE 0 END)")
    return " + ".join(terms)


SIMHASH_ORACLE = f"""
SELECT doc_id, CAST({_simhash_sql()} AS BIGINT) AS simhash16
FROM documents
"""


SIMHASH_HAMMING_MAX = 2
_SH_BANDS = 4
_SH_BAND_BITS = 4
_SH_MASK = (1 << _SH_BAND_BITS) - 1


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] SimHash near-dup pairs: candidates must collide in >= 1 of
    the 4x4-bit bands of the 16-bit signature (pigeonhole: hamming <= 3
    GUARANTEES a clean band, so the <= 2 verify below misses nothing),
    then exact hamming distance verifies.

    Scale note: the candidate bound is n^2 / 2^band_bits per band, so a
    16-bit signature saturates on billion-doc corpora; production runs
    widen to simhash64 with 8x8-bit bands (same plan shape, bound
    n^2/256 per band) — the operator contract (band-collide then
    verify) is unchanged. The band join ships only (doc_id, h, band,
    key) int rows; signatures are computed once upstream."""
    sig = simhash(spark, sf_dir).select(
        "doc_id", F.col("simhash16").alias("h"))
    bands = sig.select(
        "doc_id", "h", F.explode(F.array(*[
            F.struct(F.lit(j).alias("band"),
                     F.shiftrightunsigned("h", _SH_BAND_BITS * j)
                     .bitwiseAND(F.lit(_SH_MASK)).alias("key"))
            for j in range(_SH_BANDS)])).alias("bk"))\
        .select("doc_id", "h", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("h").alias("ha"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("h").alias("hb"), "band", "key")
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (a.join(b, ["band", "key"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ha", "hb").distinct()
            .where(hamming <= SIMHASH_HAMMING_MAX)
            .select("doc_a", "doc_b",
                    hamming.cast("int").alias("hamming")))


SIMHASH_NEAR_PAIRS_ORACLE = f"""
WITH sig AS (
  SELECT doc_id, CAST({_simhash_sql()} AS BIGINT) AS h FROM documents
),
bands AS (
  SELECT doc_id, h, j AS band, (h >> ({_SH_BAND_BITS} * j)) & {_SH_MASK}
           AS key
  FROM sig, unnest(range({_SH_BANDS})) AS t(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.h AS ha, b.h AS hb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {SIMHASH_HAMMING_MAX}
"""


# --- 64-bit SimHash (the production-width signature space) -------------
#
# The 16-bit variant above saturates on billion-doc corpora (candidate
# bound n^2 / 2^band_bits per band). This is the documented widening:
# 64 signature bits from the first 16 md5 hex chars per word, handled
# as TWO 32-bit halves so no expression ever touches the signed 64th
# bit (Spark ANSI long arithmetic + DuckDB both stay overflow-free),
# banded 8x8 bits. Pigeonhole: hamming <= 7 guarantees a clean band,
# so the <= 3 verify below is complete. Same band-collide-then-verify
# contract and plan shape (equi-join on (band, key)) as the 16-bit
# operator; only the constants widen.

SIMHASH64_HAMMING_MAX = 3
_SH64_BANDS_PER_HALF = 2  # 2 bands x 16 bits per 32-bit half
_SH64_BAND_BITS = 16
_SH64_BAND_MASK = (1 << _SH64_BAND_BITS) - 1


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] 64-bit SimHash per document as (sig_hi, sig_lo) 32-bit
    halves (reference parity: same signature family as simhash16,
    reference dedup semantics; width per the r3 scale note).

    Unlike the 16-bit operator's in-row HOF folds (interpreted
    expressions — acceptable at 16 bits, 64 s at 64), the votes here
    run as WHOLE-STAGE-CODEGEN aggregation: ``doc_term_pairs`` rolls
    words up to distinct (doc_id, term, tf) inside the row (one md5
    per DISTINCT term, tf as the vote multiplier — identical vote
    totals by linearity), then ONE pair-sized groupBy(doc_id) computes
    all 64 bit-vote sums as plain codegen'd aggregates. 57x faster at
    sf0.1 and the right shape at 100 TB: one partial-aggregated
    pair-sized shuffle, zero interpreted lambdas in the hot path."""
    from gcp_datalake_utils_spark.llm.terms import doc_term_pairs
    d = load_table(spark, sf_dir, "documents")
    hh = (doc_term_pairs(d)
          .select("doc_id", "tf",
                  F.substring(F.md5(F.col("term").cast("binary")),
                              1, 16).alias("mh"))
          .select("doc_id", "tf",
                  F.conv(F.substring("mh", 1, 8), 16, 10)
                  .cast("long").alias("wh"),
                  F.conv(F.substring("mh", 9, 8), 16, 10)
                  .cast("long").alias("wl")))

    def _votes(col: str):
        # single-parse SQL strings: ~1 py4j round-trip per aggregate
        # instead of ~8 Column calls (plan construction, not execution,
        # dominated this query's wall time — see similarity's
        # _bucket64_exploded note)
        return [F.expr(f"sum(tf * (CAST(shiftright({col}, {b}) & 1 "
                       f"AS BIGINT) * 2 - 1))").alias(f"_{col}{b}")
                for b in range(32)]

    votes = hh.groupBy("doc_id").agg(*_votes("wh"), *_votes("wl"))

    def _pack_sql(col: str) -> str:
        terms = " + ".join(
            f"(CASE WHEN _{col}{b} > 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)" for b in range(32))
        return f"CAST({terms} AS BIGINT)"

    return votes.selectExpr("doc_id",
                            _pack_sql("wh") + " AS sig_hi",
                            _pack_sql("wl") + " AS sig_lo")


def _simhash32_sql(hex_start: int) -> str:
    wh = (f"list_transform({_WORDS}, "
          f"w -> CAST(('0x' || substr(md5(w), {hex_start}, 8)) "
          f"AS BIGINT))")
    terms = []
    for b in range(32):
        vote = (f"list_sum(list_transform({wh}, "
                f"h -> CASE WHEN floor(h / {2 ** b}) % 2 = 1 "
                f"THEN 1 ELSE -1 END))")
        terms.append(
            f"(CASE WHEN {vote} > 0 THEN CAST({2 ** b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


SIMHASH64_ORACLE = f"""
SELECT doc_id, {_simhash32_sql(1)} AS sig_hi,
       {_simhash32_sql(9)} AS sig_lo
FROM documents
"""


def simhash64_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] 64-bit SimHash near-dup pairs: 4x16-bit band collide then
    exact hamming verify — the plan that holds at 1e9+ docs. With
    hamming <= 3 flipped bits and 4 bands, at least one band is
    untouched (pigeonhole), so 4 bands of 16 bits are COMPLETE — and
    a 65536-value band space collides 256x less than the first-cut
    8x8-bit layout, whose bucket fan-out showed quadratic candidate
    growth by sf3 (27 s; this layout: ~7 s). Shuffle budget: the band
    join ships only (doc_id, half sigs, band, key) int rows; the
    verify runs on cell-sharing candidates only."""
    # checkpoint: the band frame feeds BOTH sides of the self-join —
    # without it the 64-vote signature aggregation executes twice
    # (same pattern as the MinHash band keys above)
    sig = simhash64(spark, sf_dir).localCheckpoint()
    halves = [("sig_lo", 0), ("sig_hi", _SH64_BANDS_PER_HALF)]
    bands = sig.select(
        "doc_id", "sig_hi", "sig_lo", F.explode(F.array(*[
            F.struct(F.lit(off + j).alias("band"),
                     F.shiftright(F.col(col), _SH64_BAND_BITS * j)
                     .bitwiseAND(F.lit(_SH64_BAND_MASK)).alias("key"))
            for col, off in halves
            for j in range(_SH64_BANDS_PER_HALF)])).alias("bk"))\
        .select("doc_id", "sig_hi", "sig_lo", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("sig_hi").alias("ha_hi"),
                     F.col("sig_lo").alias("ha_lo"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("sig_hi").alias("hb_hi"),
                     F.col("sig_lo").alias("hb_lo"), "band", "key")
    hamming = (F.bit_count(F.col("ha_hi").bitwiseXOR(F.col("hb_hi")))
               + F.bit_count(F.col("ha_lo").bitwiseXOR(F.col("hb_lo"))))
    return (a.join(b, ["band", "key"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ha_hi", "ha_lo",
                    "hb_hi", "hb_lo").distinct()
            .where(hamming <= SIMHASH64_HAMMING_MAX)
            .select("doc_a", "doc_b",
                    hamming.cast("int").alias("hamming")))


SIMHASH64_NEAR_PAIRS_ORACLE = f"""
WITH sig AS (
  SELECT doc_id, {_simhash32_sql(1)} AS sig_hi,
         {_simhash32_sql(9)} AS sig_lo
  FROM documents
),
bands AS (
  SELECT doc_id, sig_hi, sig_lo, band,
         CASE WHEN band < {_SH64_BANDS_PER_HALF}
              THEN (sig_lo >> ({_SH64_BAND_BITS} * band))
                   & {_SH64_BAND_MASK}
              ELSE (sig_hi >> ({_SH64_BAND_BITS}
                               * (band - {_SH64_BANDS_PER_HALF})))
                   & {_SH64_BAND_MASK} END AS key
  FROM sig, unnest(range({2 * _SH64_BANDS_PER_HALF})) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig_hi AS ha_hi, a.sig_lo AS ha_lo,
         b.sig_hi AS hb_hi, b.sig_lo AS hb_lo
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha_hi, hb_hi))
            + bit_count(xor(ha_lo, hb_lo)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ha_hi, hb_hi))
      + bit_count(xor(ha_lo, hb_lo)) <= {SIMHASH64_HAMMING_MAX}
"""


# --- exact set-similarity join via prefix filtering ----------------------

# JACCARD_THRESHOLD as an exact rational (4/5) for the prefix-length
# arithmetic: ceil(0.8 * n) in floats computes ceil of
# 0.8000000000000000444*n, which overshoots when 0.8*n is an integer
# (n % 5 == 0) — a SHORTER prefix than the completeness theorem needs,
# i.e. silent false negatives exactly at J = t. Integer (4n+4) div 5
# is exact in both engines.
_T_NUM, _T_DEN = 4, 5


def prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] EXACT near-duplicate pairs via AllPairs/SSJoin prefix
    filtering — the complete counterpart to the probabilistic
    MinHash-LSH candidates (near_dup_pairs): every pair with shingle
    Jaccard >= 0.8 is found, by theorem rather than by band luck.

    Candidate generation: each doc indexes only the FIRST
    n - ceil(t*n) + 1 of its shingles in a global rarest-first order
    (frequency asc, shingle asc). Two docs with overlap >= ceil(t*n)
    must collide in these prefixes (pigeonhole on the smallest shared
    shingle), so the candidate join is complete; everything outside
    the prefixes never enters the join. Shuffle budget: the prefix
    index carries ~(1-t) of the shingle stream, and rarest-first
    ordering makes collisions (and thus candidate fan-out) minimal —
    the frequent-shingle skew that would dominate a naive
    shingle-equi-join sits in the suffixes, not the index. Verify runs
    over candidates only (shared `_verify_jaccard`).

    Two further PPJoin prunes keep the candidate set survivable on
    LOW-ENTROPY corpora (the synthetic testdata's 40-word vocabulary
    is adversarial: shingles collide by chance, 5.7M raw candidates at
    sf1 for zero true pairs). Both are sound bounds, so completeness
    is preserved:
    - length filter: J >= t forces t*max(|x|,|y|) <= min(|x|,|y|)
      (as integers: 5*min >= 4*max);
    - positional filter: for the smallest shared shingle s* (global
      order), every shared shingle sits at position >= pos(s*) in both
      docs, so overlap <= min(n_a - pos_a, n_b - pos_b) + 1; the pair
      survives only if that bound reaches the required overlap
      ceil(t/(1+t) * (n_a+n_b)) = (4*(n_a+n_b)+8) div 9. Taking MAX
      of the bound over collision rows evaluates it exactly at s*.
    Measured at sf1: 5.7M -> 1.6M candidates, 30 s -> ~13 s.

    At 100 TB: one window shuffle per doc (prefix rank), one
    prefix-sized self-join (AQE skew-split applies), one
    candidate-sized verify join — no quadratic stage anywhere; the
    pytest asserts result == brute-force on the full corpus and
    result >= the MinHash pair set."""
    sh = shingle_rows(spark, sf_dir).localCheckpoint()
    freq = sh.groupBy("s").agg(F.count("*").alias("freq"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy("freq", "s")
    plen = (F.col("n")
            - F.expr(f"({_T_NUM} * n + {_T_DEN - 1}) div {_T_DEN}")
            + F.lit(1))
    pref = (sh.join(freq, "s")
            .join(F.broadcast(sizes), "doc_id")
            .withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= plen)
            .select("doc_id", "s", "pos", "n"))
    a = pref.select(F.col("doc_id").alias("doc_a"), "s",
                    F.col("pos").alias("pa"), F.col("n").alias("na"))
    b = pref.select(F.col("doc_id").alias("doc_b"), "s",
                    F.col("pos").alias("pb"), F.col("n").alias("nb"))
    cands = (a.join(b, "s")
             .where(F.col("doc_a") < F.col("doc_b"))
             .where(F.lit(_T_DEN) * F.least("na", "nb")
                    >= F.lit(_T_NUM) * F.greatest("na", "nb"))
             .groupBy("doc_a", "doc_b")
             .agg(F.max(F.least(F.col("na") - F.col("pa"),
                                F.col("nb") - F.col("pb")) + 1)
                  .alias("ub"),
                  F.max("na").alias("na"), F.max("nb").alias("nb"))
             .where(F.col("ub") >= F.expr(
                 f"({_T_NUM} * (na + nb) + {_T_NUM + _T_DEN - 1}) "
                 f"div {_T_NUM + _T_DEN}"))
             .select("doc_a", "doc_b"))
    return _verify_jaccard(cands, sh)


PREFIX_FILTER_PAIRS_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
),
freq AS (SELECT s, count(*) AS freq FROM sh GROUP BY s),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pref AS (
  SELECT doc_id, s, pos, n FROM (
    SELECT sh.doc_id, sh.s, z.n,
           row_number() OVER (PARTITION BY sh.doc_id
                              ORDER BY f.freq, sh.s) AS pos
    FROM sh JOIN freq f USING (s) JOIN sizes z USING (doc_id))
  WHERE pos <= n - (({_T_NUM} * n + {_T_DEN - 1}) // {_T_DEN}) + 1
),
cands AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           max(least(a.n - a.pos, b.n - b.pos) + 1) AS ub,
           max(a.n) AS na, max(b.n) AS nb
    FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
    WHERE {_T_DEN} * least(a.n, b.n) >= {_T_NUM} * greatest(a.n, b.n)
    GROUP BY a.doc_id, b.doc_id)
  WHERE ub >= ({_T_NUM} * (na + nb) + {_T_NUM + _T_DEN - 1})
              // {_T_NUM + _T_DEN}
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""
