"""Fuzzy dedup as ONE restartable pipeline: shingle -> MinHash -> LSH
band join -> exact-Jaccard verify -> connected components ->
canonical selection -> kept/removed verdict for EVERY corpus document.

`dedup_groups` and `dedup_keep_best` (llm/dedup.py) expose the two
primitives as separate oracled rows; production corpus dedup
(RefinedWeb/FineWeb shape) runs them as a single checkpointed
multi-round job whose CC iteration count is data-dependent. This
module composes them with durable, resumable state:

- **stage checkpoint**: the verified near-dup edge list — the
  expensive LSH + verify stage — is written once to
  ``{run_dir}/edges`` (parquet; Spark's ``_SUCCESS`` marker is the
  commit record). A restarted driver finds the marker and skips
  straight to label propagation.
- **per-iteration checkpoint**: each hash-to-min round writes
  ``{run_dir}/labels_NNNN``; a restart resumes from the newest
  committed round instead of iteration 0. Reading each round's input
  back from its committed parquet also truncates lineage, which is
  what ``dedup_groups``' per-round ``localCheckpoint`` bought —
  here the truncation point is durable, not session-local.
- **convergence guard**: the loop stops when a round changes zero
  labels and records a ``CONVERGED`` marker (written atomically via
  rename) so a restart after convergence replays nothing.

Iteration bound: hash-to-min converges in O(component diameter)
rounds, and a near-dup cluster's diameter is a property of the
DUPLICATION (a handful of hops between variants of one document),
not of corpus size — it does not grow from sf0.01 to 100 TB.
``FUZZY_CC_MAX_ITER = 30`` is therefore a defensive bound ~10x the
deepest chain the synthetic corpus or any crawl-dedup report
exhibits; exceeding it raises instead of silently shipping
half-merged groups.

100 TB shape: per-round state is (doc_id, label) for docs that have
at least one verified near-dup — |pairs|-sized, not corpus-sized —
and each round is one shuffle keyed by vertex. The final verdict is
a broadcast-sized join back onto the corpus scan when dup clusters
are rare, an ordinary shuffled join otherwise; Spark's AQE picks.

Reference: no counterpart (the reference has no dedup surface);
extends llm/dedup.py:264 (dedup_groups) and :334 (dedup_keep_best).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import dedup
from gcp_datalake_utils_spark.llm import text as llm_text
from gcp_datalake_utils_spark.session import SessionCache, session_key
from gcp_datalake_utils_spark.sources import load_table

FUZZY_CC_MAX_ITER = 30


class FuzzyDedupInterrupted(RuntimeError):
    """Raised by the test-only ``crash_after_iter`` hook AFTER the
    named round committed — simulates a driver loss mid-job."""


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _write_marker(run_dir: str, name: str) -> None:
    tmp = os.path.join(run_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("1")
    os.rename(tmp, os.path.join(run_dir, name))


def _newest_labels_iter(run_dir: str) -> int:
    """Highest committed label round, or -1 if none."""
    best = -1
    try:
        names = os.listdir(run_dir)
    except FileNotFoundError:
        return best
    for n in names:
        if n.startswith("labels_") and _committed(
                os.path.join(run_dir, n)):
            best = max(best, int(n.split("_")[1]))
    return best


def cc_labels_restartable(
        spark: SparkSession, sf_dir: str, run_dir: str,
        max_iter: int = FUZZY_CC_MAX_ITER,
        crash_after_iter: int | None = None,
) -> tuple[DataFrame, dict]:
    """Min-label propagation to fixpoint with durable per-round
    commits under ``run_dir``. Returns (labels, info): labels =
    (doc_id, group_id) for every doc with >= 1 verified near-dup;
    info records what a restart actually reused
    (``edges_cached``, ``resumed_from_iter``, ``iters_run``,
    ``converged``)."""
    os.makedirs(run_dir, exist_ok=True)
    info = {"edges_cached": True, "resumed_from_iter": -1,
            "iters_run": 0, "converged": False}

    edges_path = os.path.join(run_dir, "edges")
    if not _committed(edges_path):
        info["edges_cached"] = False
        pairs = dedup.near_dup_pairs(spark, sf_dir) \
            .select("doc_a", "doc_b")
        (pairs.select(F.col("doc_a").alias("src"),
                      F.col("doc_b").alias("dst"))
         .union(pairs.select(F.col("doc_b").alias("src"),
                             F.col("doc_a").alias("dst")))
         .write.mode("overwrite").parquet(edges_path))
    edges = spark.read.parquet(edges_path)

    it = _newest_labels_iter(run_dir)
    info["resumed_from_iter"] = it
    if it < 0:
        it = 0
        (edges.select(F.col("src").alias("doc_id")).distinct()
         .withColumn("group_id", F.col("doc_id"))
         .write.mode("overwrite")
         .parquet(os.path.join(run_dir, "labels_0000")))
    labels = spark.read.parquet(
        os.path.join(run_dir, f"labels_{it:04d}"))
    if os.path.exists(os.path.join(run_dir, "CONVERGED")):
        info["converged"] = True
        return labels, info

    while it < max_iter:
        prop = (edges.join(labels, edges["src"] == labels["doc_id"])
                .select(F.col("dst").alias("doc_id"), "group_id"))
        new_labels = (labels.union(prop)
                      .groupBy("doc_id")
                      .agg(F.min("group_id").alias("group_id")))
        it += 1
        out = os.path.join(run_dir, f"labels_{it:04d}")
        new_labels.write.mode("overwrite").parquet(out)
        new_labels = spark.read.parquet(out)  # durable lineage cut
        changed = (new_labels
                   .join(labels.withColumnRenamed("group_id", "old"),
                         "doc_id")
                   .where(F.col("group_id") != F.col("old")).count())
        labels = new_labels
        info["iters_run"] += 1
        if changed == 0:
            _write_marker(run_dir, "CONVERGED")
            info["converged"] = True
            break
        if crash_after_iter is not None and it >= crash_after_iter:
            raise FuzzyDedupInterrupted(f"simulated crash after "
                                        f"committed round {it}")
    if not info["converged"]:
        raise RuntimeError(
            f"CC did not converge in {max_iter} rounds — component "
            f"diameter exceeds the documented bound; raise "
            f"FUZZY_CC_MAX_ITER only after inspecting the pair graph")
    return labels, info


_RUN_DIRS = SessionCache()


def _default_run_dir(spark: SparkSession, sf_dir: str) -> str:
    """One run dir per (session, sf_dir): the first caller pays the
    full pipeline; later callers in the same session (e.g. the rollup
    after the doc-level row) find the CONVERGED marker and replay
    nothing. pid_scratch wipes only on this first acquisition."""
    def _build() -> str:
        from gcp_datalake_utils_spark.sources.scratch import pid_scratch
        return pid_scratch("/tmp/spark_graft_fuzzydedup", sf_dir)

    return _RUN_DIRS.get_or_build((session_key(spark), sf_dir), _build)


def fuzzy_dedup_removal(spark: SparkSession, sf_dir: str,
                        run_dir: str | None = None) -> DataFrame:
    """[Q] the composed fuzzy-dedup transform, doc-level verdict for
    the WHOLE corpus: (doc_id, group_id, group_size, kept).

    - group_id: connected-component label (min doc_id in the
      component) for docs with a verified near-dup; the doc's own id
      otherwise (singleton groups).
    - kept: within each multi-doc group, the highest
      ``quality_score`` survives (ties -> lowest doc_id — a total
      order, so the verdict is deterministic under any partitioning);
      singletons are always kept.
    """
    if run_dir is None:
        run_dir = _default_run_dir(spark, sf_dir)
    labels, _ = cc_labels_restartable(spark, sf_dir, run_dir)
    q = llm_text.token_stats(spark, sf_dir) \
        .select("doc_id", "quality_score")
    w_sz = Window.partitionBy("group_id")
    w_rk = Window.partitionBy("group_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id"))
    grouped = (labels.join(q, "doc_id")
               .withColumn("group_size",
                           F.count("*").over(w_sz).cast("long"))
               .withColumn("kept", F.row_number().over(w_rk) == 1)
               .select("doc_id", "group_id", "group_size", "kept"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (docs.join(grouped, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("group_id", "doc_id").alias("group_id"),
                    F.coalesce("group_size", F.lit(1))
                    .cast("long").alias("group_size"),
                    F.coalesce("kept", F.lit(True)).alias("kept")))


FUZZY_DEDUP_REMOVAL_ORACLE = f"""
WITH groups AS MATERIALIZED ({dedup.DEDUP_GROUPS_ORACLE}),
stats AS ({llm_text.TOKEN_STATS_ORACLE}),
ranked AS (
  SELECT g.doc_id, g.group_id, g.group_size,
         row_number() OVER (PARTITION BY g.group_id
                            ORDER BY s.quality_score DESC, g.doc_id)
           = 1 AS kept
  FROM groups g JOIN stats s USING (doc_id)
)
SELECT d.doc_id,
       coalesce(r.group_id, d.doc_id) AS group_id,
       CAST(coalesce(r.group_size, 1) AS BIGINT) AS group_size,
       coalesce(r.kept, TRUE) AS kept
FROM documents d LEFT JOIN ranked r USING (doc_id)
"""


def fuzzy_dedup_rollup(spark: SparkSession, sf_dir: str,
                       run_dir: str | None = None) -> DataFrame:
    """[Q] one-row removal report for the composed transform — the
    number a dedup run ships to its training-data ledger: documents
    and tokens dropped, and how many multi-doc groups drove it."""
    per = fuzzy_dedup_removal(spark, sf_dir, run_dir=run_dir)
    toks = llm_text.token_stats(spark, sf_dir) \
        .select("doc_id", "n_tokens")
    j = per.join(toks, "doc_id")
    return j.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum((~F.col("kept")).cast("long")).alias("n_removed"),
        F.countDistinct(
            F.when(F.col("group_size") > 1, F.col("group_id")))
        .alias("n_dup_groups"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.when(~F.col("kept"), F.col("n_tokens"))
              .otherwise(F.lit(0))).alias("removed_tokens"),
        F.round(F.sum(F.when(~F.col("kept"), F.col("n_tokens"))
                      .otherwise(F.lit(0)))
                / F.sum("n_tokens").cast("double"), 6)
        .alias("removed_token_rate"))


FUZZY_DEDUP_ROLLUP_ORACLE = f"""
WITH verdict AS MATERIALIZED ({FUZZY_DEDUP_REMOVAL_ORACLE}),
stats AS ({llm_text.TOKEN_STATS_ORACLE})
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN v.kept THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN v.kept THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed,
       CAST(count(DISTINCT CASE WHEN v.group_size > 1
                                THEN v.group_id END) AS BIGINT)
         AS n_dup_groups,
       CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN v.kept THEN 0 ELSE s.n_tokens END)
            AS BIGINT) AS removed_tokens,
       round(sum(CASE WHEN v.kept THEN 0 ELSE s.n_tokens END)
             / CAST(sum(s.n_tokens) AS DOUBLE), 6)
         AS removed_token_rate
FROM verdict v JOIN stats s USING (doc_id)
"""
