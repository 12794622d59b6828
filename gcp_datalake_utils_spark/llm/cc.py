"""Shared connected-components kernel: hash-to-min label propagation.

One implementation of the loop `dedup_groups` (llm/dedup.py:264)
introduced and proved out: every vertex repeatedly takes the min
label in its closed neighborhood; fixpoint in O(component diameter)
rounds. Near-dup / semantic-dup clusters are shallow (diameter is a
property of the duplication, not the corpus size), so the round
count stays small at 100 TB while each round is ONE shuffle keyed by
vertex; per-round state is |edge endpoints|-sized, never
corpus-sized. Each round localCheckpoints — lineage would otherwise
double per round. For the DURABLE variant with per-round parquet
commits and crash resume, see llm/fuzzydedup.cc_labels_restartable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ITER = 30


def cc_min_label(pairs: DataFrame, a: str, b: str,
                 vertex: str = "doc_id", label: str = "group_id",
                 max_iter: int = CC_MAX_ITER) -> DataFrame:
    """(vertex, label) for every endpoint of ``pairs`` (columns
    ``a``, ``b``): label = min vertex id of the connected component.
    Raises past ``max_iter`` rounds instead of shipping half-merged
    components."""
    from pyspark.sql import Observation

    pairs = pairs.select(a, b).localCheckpoint()
    edges = (pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
             .union(pairs.select(F.col(b).alias("src"),
                                 F.col(a).alias("dst")))
             .localCheckpoint())
    labels = (edges.select(F.col("src").alias(vertex)).distinct()
              .withColumn(label, F.col(vertex))
              .localCheckpoint())
    for _ in range(max_iter):
        # min over the closed neighborhood, keeping the old label in
        # the row so the convergence test rides the SAME job as the
        # checkpoint (an Observation) instead of a second join+count
        # job per round. least(old, min(incoming)) == the previous
        # union+groupBy+min: prop covers every vertex with an edge,
        # and labels covers all vertices, so the closed-neighborhood
        # min is unchanged.
        prop = (edges.join(labels, edges["src"] == labels[vertex])
                .select(F.col("dst").alias(vertex), label)
                .groupBy(vertex)
                .agg(F.min(label).alias("_in")))
        obs = Observation()
        new_labels = (labels.withColumnRenamed(label, "_old")
                      .join(prop, vertex, "left")
                      .select(vertex,
                              F.least(F.col("_old"),
                                      F.coalesce("_in", F.col("_old")))
                              .alias(label),
                              F.col("_old"))
                      .observe(obs, F.sum(
                          (F.col(label) != F.col("_old"))
                          .cast("long")).alias("n_changed"))
                      .select(vertex, label)
                      .localCheckpoint())
        changed = int(obs.get["n_changed"] or 0)
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"CC did not converge in {max_iter} rounds — component "
        f"diameter exceeds the documented bound")
