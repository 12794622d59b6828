"""Distributed exact global ranking/ntile (shared by rfm_segments and
the LM quality-bin scale twin). A no-partition Window plans ONE
SinglePartition exchange — fine at 1e5 rows, DNF at 1e9 — so exact
global ntiles over data-scale frames use the range-partition +
per-partition row_number + actual-count-offset recipe here instead."""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    (k-means, budget prefix).

    Local ranks come from monotonically_increasing_id over the sorted
    partitions (pid<<33 + in-partition offset), NOT a row_number
    window: RangePartitioning does not satisfy the window's
    ClusteredDistribution(_pid), so the window shape silently planned
    a SECOND full Exchange + Sort (found round 9 — results stayed
    correct because _pid values travel with the rows, but the range
    sort ran as dead work and every ranked frame crossed the wire
    twice). The id is evaluated in the same stage as the
    partition-local sort and pinned by the checkpoint; per-partition
    offsets come from the same stats collect that always ran."""
    if checkpoint_input:
        df = df.localCheckpoint()
    ranked = (df.repartitionByRange(_RANK_PARTS, *order_exprs)
              .sortWithinPartitions(*order_exprs)
              .withColumn("_mid", F.monotonically_increasing_id())
              .localCheckpoint())
    stats = (ranked
             .groupBy(F.shiftright("_mid", 33).cast("int").alias("_p"))
             .agg(F.count("*").alias("c"), F.min("_mid").alias("m0"))
             .collect())
    sizes = {r["_p"]: r["c"] for r in stats}
    base = {r["_p"]: r["m0"] for r in stats}
    n = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    # global rank = _mid + (partition offset - partition id base + 1)
    adj = F.element_at(
        F.create_map(*[c for p in sizes
                       for c in (F.lit(p),
                                 F.lit(offsets[p] - base[p] + 1)
                                 .cast("long"))]),
        F.shiftright("_mid", 33).cast("int"))
    rank = F.col("_mid") + adj
    q, m = divmod(n, bins)
    bucket = F.when(
        rank <= m * (q + 1),
        F.floor((rank - 1) / (q + 1)) + 1
    ).otherwise(
        m + F.floor((rank - 1 - m * (q + 1)) / max(q, 1)) + 1)
    return ranked.withColumn(out, bucket.cast("int")).drop("_mid")




def distributed_ntile_multi(df: DataFrame, key: str,
                            branches: list, bins: int,
                            payload: tuple = (),
                            sv_type: str = "decimal(38,6)") -> DataFrame:
    """Fused exact ntile(bins) over SEVERAL global orderings of one
    frame in ONE coordination round (round 9, r8 verdict ask #5).

    ``branches`` is a list of (sort_expr, out_col): sort_expr a
    NUMERIC Column already encoding direction (negate for DESC) and
    non-null; ties break on ``key`` ascending in every branch. The
    chained recipe (distributed_ntile per branch) pays one
    repartitionByRange sampling job + exchange + offsets collect PER
    BRANCH — three sequential driver coordination rounds for RFM.
    This fusion tags each branch, unions the slim (branch, sortval,
    key) projections, range-partitions ONCE on (branch, sortval, key)
    — branch leads the range key, so partitions are branch-contiguous
    up to at most one straddling boundary partition, which the
    (pid, branch)-keyed offsets handle exactly — and collects ONE
    (parts x branches)-row size table. Rank -> bucket arithmetic is
    SQL ntile's (first n % bins buckets take the extra row), per
    branch. Scores come back as one pivot-style aggregate on ``key``
    and join onto the input frame: both sides are key-cardinality and
    slim, a plain partial-aggregated hash join at any scale. No stage
    plans a SinglePartition exchange (plan-guarded).

    Sort values are cast to ``sv_type`` (default DECIMAL(38,6)): exact
    for int/long/decimal(18,2) metrics (a double cast could collapse
    distinct int64s past 2^53 and reorder ties differently than the
    oracle's native-type sort). Callers whose metrics are all integral
    pass sv_type="long" — primitive sort keys make the range exchange
    and per-partition sorts markedly cheaper than 16-byte decimals.

    ``payload`` columns ride along on branch 0's fan rows (NULL on the
    other branches) and come back out of the same pivot aggregate —
    callers that only need (key, scores, payload) downstream avoid a
    key-exchange join back onto the input frame entirely. With payload
    the result is (key, *outs, *payload); without it the scores join
    back onto the full input frame."""
    from functools import reduce

    df = df.localCheckpoint()
    nb = len(branches)

    def pay_cols(i: int):
        return [(F.col(p) if i == 0 else
                 F.lit(None).cast(df.schema[p].dataType)).alias(p)
                for p in payload]

    fan = reduce(lambda a, b: a.unionAll(b), [
        df.select(F.lit(i).alias("_br"),
                  expr.cast(sv_type).alias("_sv"),
                  F.col(key).alias("_k"), *pay_cols(i))
        for i, (expr, _) in enumerate(branches)])
    order = [F.col("_br"), F.col("_sv"), F.col("_k")]
    # local order from monotonically_increasing_id over the sorted
    # partitions, not a row_number window — the window shape planned a
    # hidden second Exchange+Sort (see distributed_ntile docstring)
    ranked = (fan.repartitionByRange(_RANK_PARTS * nb, *order)
              .sortWithinPartitions(*order)
              .withColumn("_mid", F.monotonically_increasing_id())
              .localCheckpoint())
    stats = (ranked
             .groupBy(F.shiftright("_mid", 33).cast("int").alias("_p"),
                      "_br")
             .agg(F.count("*").alias("c"), F.min("_mid").alias("m0"))
             .collect())
    sizes = {(r["_p"], r["_br"]): r["c"] for r in stats}
    base = {(r["_p"], r["_br"]): r["m0"] for r in stats}
    ns = {br: sum(c for (_, b), c in sizes.items() if b == br)
          for br in range(nb)}
    offsets, acc = {}, {br: 0 for br in range(nb)}
    for pid, br in sorted(sizes):
        offsets[(pid, br)] = acc[br]
        acc[br] += sizes[(pid, br)]
    adj = F.element_at(
        F.create_map(*[c for (pid, br) in sizes
                       for c in (F.lit(pid * nb + br),
                                 F.lit(offsets[(pid, br)]
                                       - base[(pid, br)] + 1)
                                 .cast("long"))]),
        (F.shiftright("_mid", 33).cast("int") * nb
         + F.col("_br")).cast("int"))
    rank = F.col("_mid") + adj

    def bucket_for(n: int):
        q, m = divmod(n, bins)
        return F.when(
            rank <= m * (q + 1),
            F.floor((rank - 1) / (q + 1)) + 1
        ).otherwise(
            m + F.floor((rank - 1 - m * (q + 1)) / max(q, 1)) + 1)

    bucket = reduce(
        lambda acc_e, br: acc_e.when(F.col("_br") == br,
                                     bucket_for(ns[br])),
        range(1, nb), F.when(F.col("_br") == 0, bucket_for(ns[0])))
    scores = ranked.select("_k", "_br", bucket.cast("int").alias("_s"),
                           *payload)
    wide = scores.groupBy("_k").agg(
        *[F.max(F.when(F.col("_br") == i, F.col("_s"))).alias(out)
          for i, (_, out) in enumerate(branches)],
        *[F.max(p).alias(p) for p in payload])
    if payload:
        return wide.withColumnRenamed("_k", key)
    return df.join(wide, df[key] == wide["_k"]).drop("_k")


def ntile_boundaries_multi(df: DataFrame, key: str,
                           branches: list, bins: int,
                           sv_type: str = "long") -> list:
    """Exact per-branch ntile CUT ROWS instead of per-row ranks: for
    each branch, the (sortval, key) pairs at global ranks e_1..e_{bins-1}
    (SQL ntile's bucket ends — the first n%bins buckets take the extra
    row). Returns [branch][k] -> (sv, key).

    Why this exists (round 9): when the consumer only needs each row's
    BUCKET (rfm's <=125-cell grid), materializing per-row ranks and
    pivoting them back through a key exchange is waste — bucket
    membership is just "how many cut rows sort strictly below me",
    a map-side comparison against bins-1 collected boundary pairs.
    This shape ranks the branch-tagged fan ONCE (one slim range
    exchange: the fan rows are (byte, sv, key) built by inline() in a
    single scan, no payload), then runs two tiny driver jobs against
    the checkpointed ranked frame: the (parts x branches)-row size
    table and the (bins-1)*branches boundary-row filter. The consumer
    frame itself is never exchanged. Ties: lexicographic
    (sv, key) — a total order, so cuts are exact and deterministic,
    matching ORDER BY sv, key ntile semantics in both engines.

    At 100 TB: the fan exchange is the only wide op and carries ~17
    bytes/row/branch; boundary collect is bins*branches rows
    regardless of corpus size.

    CONTRACT: `df` must be deterministic/pinned (localCheckpoint or a
    stable source read) — the cut rows come from one scan of `df`
    while callers bucket a separately re-scanned frame, so a
    nondeterministic input would yield cuts inconsistent with the
    rows being bucketed (current callers rfm_segments and
    source_length_deciles checkpoint first)."""
    nb = len(branches)
    fan = df.select(F.inline(F.array(*[
        F.struct(F.lit(i).alias("_br"),
                 expr.cast(sv_type).alias("_sv"),
                 F.col(key).alias("_k"))
        for i, (expr, _) in enumerate(branches)])))
    order = [F.col("_br"), F.col("_sv"), F.col("_k")]
    ranked = (fan.repartitionByRange(_RANK_PARTS * nb, *order)
              .sortWithinPartitions(*order)
              .withColumn("_mid", F.monotonically_increasing_id())
              .localCheckpoint())
    mids = _boundary_mids(ranked, ["_br"], bins)
    out = [dict() for _ in range(nb)]
    for r in ranked.where(F.col("_mid").isin(list(mids))).collect():
        (br,), k = mids[r["_mid"]]
        out[br][k] = (r["_sv"], r["_k"])
    return [[b[k] for k in sorted(b)] for b in out]


def _boundary_mids(ranked: DataFrame, group_cols: list,
                   bins: int) -> dict:
    """Shared boundary locator over a mid-stamped ranked frame: one
    stats job (count + min mid per (partition, group)), _cut_targets,
    then each cut row's ABSOLUTE mid = group's partition-base mid +
    local rank - 1. Returns {mid: (group_tuple, k)} — consumers fetch
    the cut rows with a single isin filter, no OR-chain."""
    stats = (ranked
             .groupBy(F.shiftright("_mid", 33).cast("int").alias("_p"),
                      *group_cols)
             .agg(F.count("*").alias("c"), F.min("_mid").alias("m0"))
             .collect())
    sizes = {(r["_p"], tuple(r[g] for g in group_cols)): r["c"]
             for r in stats}
    base = {(r["_p"], tuple(r[g] for g in group_cols)): r["m0"]
            for r in stats}
    targets = _cut_targets(sizes, bins)
    return {base[(pid, g)] + lrn - 1: (g, k)
            for (pid, g, lrn), (g2, k) in targets.items()}


def _cut_targets(sizes: dict, bins: int) -> dict:
    """Shared cut-row locator: from actual per-(partition, group)
    counts, the (pid, group, local_rank) locations of each group's
    SQL-ntile bucket-END rows (the first n % bins buckets take the
    extra row). Returns {(pid, g, lrn): (g, k)}."""
    targets = {}
    for g in sorted({gg for (_, gg) in sizes}):
        n = sum(c for (p, gg), c in sizes.items() if gg == g)
        q, m = divmod(n, bins)
        acc = 0
        ends = []
        for k in range(1, bins):
            acc += (q + 1) if k <= m else q
            ends.append(min(acc, n))
        run = 0
        pids = sorted(p for (p, gg) in sizes if gg == g)
        it = iter(pids)
        pid = next(it, None)
        for k, e in enumerate(ends, start=1):
            if e <= 0:
                continue
            while pid is not None and run + sizes[(pid, g)] < e:
                run += sizes[(pid, g)]
                pid = next(it, None)
            if pid is not None:
                targets[(pid, g, e - run)] = (g, k)
    return targets


def group_ntile_boundaries(df: DataFrame, group: str, sv, key: str,
                           bins: int, sv_type: str = "long") -> dict:
    """Exact PER-GROUP ntile cut rows in one coordination round — the
    grouped sibling of ntile_boundaries_multi. Each row belongs to ONE
    group (a data value: source, language, shard — bounded
    cardinality), so there is no fan replication; the slim (group, sv,
    key) projection range-partitions on all three, which SPLITS a hot
    group across partitions where a per-group Window would hand the
    whole group to one task (the same straggler windows always have —
    no AQE skew split). Cut rows per group come from actual partition
    counts (_cut_targets), so buckets are SQL-ntile-exact with
    (sv, key) lexicographic ties. Returns {group: [(sv, key), ...]};
    consumers bucket map-side via bucket_by_boundaries (a
    groups x (bins-1) literal CASE — for unbounded group counts use a
    broadcast cuts join instead).

    CONTRACT: `df` must be deterministic/pinned (localCheckpoint or a
    stable source read) — cuts are derived from one scan of `df`
    while callers bucket a separately re-scanned frame; a
    nondeterministic input gives cuts inconsistent with the bucketed
    rows."""
    fan = df.select(F.col(group).alias("_g"),
                    sv.cast(sv_type).alias("_sv"),
                    F.col(key).alias("_k"))
    order = [F.col("_g"), F.col("_sv"), F.col("_k")]
    ranked = (fan.repartitionByRange(_RANK_PARTS, *order)
              .sortWithinPartitions(*order)
              .withColumn("_mid", F.monotonically_increasing_id())
              .localCheckpoint())
    mids = _boundary_mids(ranked, ["_g"], bins)
    out: dict = {}
    for r in ranked.where(F.col("_mid").isin(list(mids))).collect():
        (g,), k = mids[r["_mid"]]
        out.setdefault(g, {})[k] = (r["_sv"], r["_k"])
    return {g: [d[k] for k in sorted(d)] for g, d in out.items()}


def bucket_by_boundaries(sv, key_col, cuts: list):
    """Map-side ntile bucket from ntile_boundaries_multi cut rows:
    1 + count of cuts sorting strictly below (sv, key)."""
    expr = F.lit(1)
    for (bv, bk) in cuts:
        after = (sv > F.lit(bv)) | ((sv == F.lit(bv))
                                    & (key_col > F.lit(bk)))
        expr = expr + F.when(after, 1).otherwise(0)
    return expr
