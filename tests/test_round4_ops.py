"""Round-4 operators: 64-bit SimHash/ANN, nested line groups, narrow
term pairs, threshold-trimmed stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import dedup, sampling, similarity
from gcp_datalake_utils_spark.llm.terms import doc_term_pairs
from gcp_datalake_utils_spark.operators import nested
from gcp_datalake_utils_spark.sources import load_table


def test_simhash64_halves_in_range(spark, sf_dir):
    rows = dedup.simhash64(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.sig_hi < 2 ** 32
        assert 0 <= r.sig_lo < 2 ** 32


def test_simhash64_banding_is_complete(spark, sf_dir):
    """Pigeonhole completeness: every pair at hamming <=
    SIMHASH64_HAMMING_MAX must be found by band collision (8 bands of
    8 bits tolerate hamming <= 7). Brute-force the signature table and
    compare pair sets."""
    sig = dedup.simhash64(spark, sf_dir).collect()
    want = set()
    for i, a in enumerate(sig):
        for b in sig[i + 1:]:
            ham = (bin(a.sig_hi ^ b.sig_hi).count("1")
                   + bin(a.sig_lo ^ b.sig_lo).count("1"))
            if ham <= dedup.SIMHASH64_HAMMING_MAX:
                pair = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id))
                want.add(pair + (ham,))
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in dedup.simhash64_near_pairs(spark, sf_dir).collect()}
    assert got == want


def test_batch_ann64_matches_manual_probe(spark, sf_dir):
    """Every returned neighbor must share the query's bucket in at
    least one of the 65 probes, ranks must be dense per query, and
    ranks never exceed BATCH_TOP_K."""
    rows = similarity.batch_ann64_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert ranks[-1] <= similarity.BATCH_TOP_K


def test_order_lines_nested_matches_exploded(spark, sf_dir):
    """The HOF computation over the embedded array must equal the flat
    per-order aggregation it replaces."""
    li = load_table(spark, sf_dir, "lineitem")
    flat = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
            .agg(F.count("*").cast("int").alias("n_lines"),
                 F.max("l_quantity").alias("max_qty"),
                 F.sum(F.when(F.col("l_quantity") >= nested.HEAVY_QTY, 1)
                       .otherwise(0)).cast("int").alias("n_heavy"),
                 F.max(F.col("l_discount") > nested.DEEP_DISCOUNT)
                 .alias("has_deep_disc")))
    got = {r.o_orderkey: r for r in
           nested.order_lines_nested(spark, sf_dir).collect()}
    for r in flat.collect():
        g = got[r.o_orderkey]
        assert g.n_lines == r.n_lines
        assert g.max_qty == r.max_qty
        assert g.n_heavy == r.n_heavy
        assert g.has_deep_disc == r.has_deep_disc


def test_doc_term_pairs_equals_explode_groupby(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    got = doc_term_pairs(d)
    ref = (d.select("doc_id",
                    F.explode(F.split(F.trim("text"), " ")).alias("term"))
           .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_stratified_sample_equals_naive_rank(spark, sf_dir):
    """The threshold-prefiltered + top-up plan must return exactly the
    naive full-rank sample (same rows, same ranks)."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    from pyspark.sql import Window
    strat = Window.partitionBy("lang", "source")
    w = strat.orderBy(key.asc(), F.col("doc_id").asc())
    naive = (d.select(
        "doc_id", "lang", "source",
        F.count("*").over(strat).alias("stratum_n"),
        F.row_number().over(w).cast("int").alias("sample_rank"))
        .where(F.col("sample_rank")
               <= F.ceil(F.lit(sampling.SAMPLE_FRAC)
                         * F.col("stratum_n"))))
    got = sampling.stratified_sample(spark, sf_dir)
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_funnel_counts_monotone_and_rates(spark, sf_dir):
    from gcp_datalake_utils_spark.operators import funnel
    rows = sorted(funnel.funnel_conversion(spark, sf_dir).collect(),
                  key=lambda r: r.step)
    assert [r.step_name for r in rows] == funnel.FUNNEL_STEPS
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True)  # funnel narrows
    assert ns[0] > 0
    assert rows[0].conv_from_prev == 1.0
    assert rows[0].conv_from_first == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.conv_from_prev == round(cur.n_users / prev.n_users, 6)


def test_funnel_chain_matches_python_replica(spark, sf_dir):
    """Greedy-chain semantics replicated in pure Python over the raw
    events — guards the join/horizon conditions."""
    import collections
    from gcp_datalake_utils_spark.operators import funnel
    from gcp_datalake_utils_spark.sources import load_events
    ev = collections.defaultdict(list)
    for r in load_events(spark, sf_dir).collect():
        ev[r.user_id].append((r.ts, r.event_type))
    horizon = 72 * 3600
    ns = [0, 0, 0]
    for user, rows in ev.items():
        rows.sort()
        t_prev = None
        for i, step in enumerate(funnel.FUNNEL_STEPS):
            cand = [t for t, k in rows if k == step and (
                t_prev is None
                or (t > t_prev
                    and (t - t_prev).total_seconds() <= horizon))]
            if not cand:
                break
            t_prev = min(cand)
            ns[i] += 1
    got = sorted(funnel.funnel_conversion(spark, sf_dir).collect(),
                 key=lambda r: r.step)
    assert [r.n_users for r in got] == ns


def test_psi_nonnegative_and_counts_partition(spark, sf_dir):
    """PSI is a sum of (p-q)ln(p/q) >= 0 terms; ref_n + cur_n must
    partition the event count per type."""
    from gcp_datalake_utils_spark.operators import drift
    from gcp_datalake_utils_spark.sources import load_events
    rows = drift.value_drift_psi(spark, sf_dir).collect()
    totals = {r.event_type: r[1] for r in load_events(spark, sf_dir)
              .groupBy("event_type").count().collect()}
    assert len(rows) == len(totals)
    for r in rows:
        assert r.psi >= 0
        assert r.ref_n + r.cur_n == totals[r.event_type]
        assert r.ref_n > 0 and r.cur_n > 0
