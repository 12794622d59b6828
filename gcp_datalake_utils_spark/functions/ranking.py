"""Distributed exact global ranking/ntile (shared by rfm_segments and
the LM quality-bin scale twin). A no-partition Window plans ONE
SinglePartition exchange — fine at 1e5 rows, DNF at 1e9 — so exact
global ntiles over data-scale frames use the range-partition +
per-partition row_number + actual-count-offset recipe here instead."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK_PARTS = 32


def distributed_ntile(df: DataFrame, order_exprs: list,
                      out: str, bins: int,
                      checkpoint_input: bool = True) -> DataFrame:
    """Exact ntile(bins) over a GLOBAL (order_exprs) total order,
    computed scalably: Spark plans a no-partition Window as ONE
    SinglePartition exchange (fine at 1e5 rows, DNF at 1e9), so this
    uses the distributed global-rank recipe instead — range-partition
    on the order key, per-partition row_number, then add each
    partition's cumulative offset (a _RANK_PARTS-row collect). Ranks
    are exact regardless of where the sampled range boundaries land
    because offsets come from ACTUAL partition counts and the order
    key is a total order (callers append a unique tie-break column).
    The rank -> bucket arithmetic replicates SQL ntile exactly: the
    first n % bins buckets take one extra row.

    TWO localCheckpoints, both load-bearing: the INPUT one because
    repartitionByRange runs a SAMPLING job over its child before the
    exchange — with an expensive upstream (the Arrow LM scoring pass,
    an orders rollup) the whole lineage would execute twice (measured:
    lm_quality_bins_arrow 4.9 -> 9.4 s at sf10 without it); the RANKED
    one because the offset collect and the final projection both
    consume it. Chained callers (rfm's 2nd/3rd ntile) whose input IS
    the previous call's checkpoint pass checkpoint_input=False. The
    operator is eager, like the other driver-coordinated shapes
    (k-means, budget prefix)."""
    if checkpoint_input:
        df = df.localCheckpoint()
    ranked = (df.repartitionByRange(_RANK_PARTS, *order_exprs)
              .sortWithinPartitions(*order_exprs)
              .withColumn("_pid", F.spark_partition_id())
              .withColumn("_lrn", F.row_number().over(
                  Window.partitionBy("_pid").orderBy(*order_exprs)))
              .localCheckpoint())
    sizes = {r["_pid"]: r["c"] for r in
             ranked.groupBy("_pid").agg(F.count("*").alias("c"))
             .collect()}
    n = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"))
    rank = off + F.col("_lrn")
    q, m = divmod(n, bins)
    bucket = F.when(
        rank <= m * (q + 1),
        F.floor((rank - 1) / (q + 1)) + 1
    ).otherwise(
        m + F.floor((rank - 1 - m * (q + 1)) / max(q, 1)) + 1)
    return ranked.withColumn(out, bucket.cast("int")) \
        .drop("_pid", "_lrn")


