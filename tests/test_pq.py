"""Product quantization (llm/pq.py): argmin optimality, ADC sum
identity, recall-arm ordering, and the codes-only-shuffle plan shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import pq
from gcp_datalake_utils_spark.sources import load_table


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution \
        .ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_pq_codes_shape_and_range(spark, sf_dir):
    rows = pq.pq_codes(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    for r in rows:
        assert len(r.codes) == pq.PQ_M
        assert all(0 <= c < pq.PQ_K for c in r.codes)
        assert r.recon_err >= 0.0


def test_pq_assignment_is_argmin(spark, sf_dir):
    """Every vector's chosen code must be (rounded-)distance-optimal
    against the final codebook — the argmin invariant, checked with
    Spark's own trained centroids so no cross-engine mean drift can
    fake a failure."""
    e = load_table(spark, sf_dir, "embeddings")
    cents, assign = pq._pq_train(e)
    C = {}  # (m, code) -> centroid
    for r in cents.collect():
        C[(r.m, r.code)] = np.asarray(r.centroid, dtype=np.float64)
    sub = {(r.vec_id, r.m): np.asarray(r.sub, dtype=np.float64)
           for r in pq._subvectors(e).collect()}
    for r in assign.collect():
        s = sub[(r.vec_id, r.m)]
        chosen = ((s - C[(r.m, r.code)]) ** 2).sum()
        for (m, code), c in C.items():
            if m != r.m:
                continue
            # rounded-argmin: chosen can exceed another centroid's raw
            # distance by at most one rounding quantum
            assert chosen <= ((s - c) ** 2).sum() + 1.001e-6, \
                (r.vec_id, r.m, r.code, code)


def test_pq_adc_is_lut_sum(spark, sf_dir):
    """approx_dist must equal the sum of the query's per-subspace
    LUT entries at the vector's codes (the ADC identity)."""
    e = load_table(spark, sf_dir, "embeddings")
    cents, assign = pq._pq_train(e)
    q = np.asarray(
        e.where(F.col("vec_id") == pq.QUERY_VEC_ID)
        .select("embedding").first()[0], dtype=np.float64)
    lut = {}
    for r in cents.collect():
        qs = q[r.m * pq.PQ_SUB:(r.m + 1) * pq.PQ_SUB]
        lut[(r.m, r.code)] = round(
            float(((qs - np.asarray(r.centroid)) ** 2).sum()), 6)
    codes = {}
    for r in assign.collect():
        codes.setdefault(r.vec_id, {})[r.m] = r.code
    got = {r.vec_id: r.approx_dist
           for r in pq._adc_scores(spark, sf_dir).collect()}
    assert pq.QUERY_VEC_ID not in got
    for vid, per_m in codes.items():
        if vid == pq.QUERY_VEC_ID:
            continue
        want = sum(lut[(m, c)] for m, c in per_m.items())
        assert abs(got[vid] - want) < 2e-6, vid


def test_pq_recall_arms(spark, sf_dir):
    rows = {r.arm: r for r in pq.pq_recall_audit(spark, sf_dir).collect()}
    assert set(rows) == {"adc_raw", "shortlist_rerank"}
    for r in rows.values():
        assert r.k == pq.TOP_K
        assert 0 <= r.hits <= r.k
        assert abs(r.recall - r.hits / r.k) < 1e-9
    # reranking a superset shortlist can only help
    assert (rows["shortlist_rerank"].hits >= rows["adc_raw"].hits)


def test_pq_codes_arrow_bit_identical(spark, sf_dir):
    """The Arrow encode twin must reproduce the JVM rows EXACTLY —
    codes AND the rounded recon_err (the r6s/sus-rescue contract)."""
    jvm = {r.vec_id: (r.label, tuple(r.codes), r.recon_err)
           for r in pq.pq_codes(spark, sf_dir).collect()}
    arrow = {r.vec_id: (r.label, tuple(r.codes), r.recon_err)
             for r in pq.pq_codes_arrow(spark, sf_dir).collect()}
    assert jvm == arrow and len(jvm) > 0


def test_pq_codes_sampled_contract(spark, sf_dir):
    """Sample-trained codes: same shape/row-count as the full-trained
    row, codes in range, and mean reconstruction error within 2x of
    the full-trained codebook's (the sample is half this corpus)."""
    full = pq.pq_codes(spark, sf_dir).collect()
    samp = pq.pq_codes_sampled(spark, sf_dir).collect()
    assert len(full) == len(samp)
    for r in samp:
        assert len(r.codes) == pq.PQ_M
        assert all(0 <= c < pq.PQ_K for c in r.codes)
    mf = sum(r.recon_err for r in full) / len(full)
    ms = sum(r.recon_err for r in samp) / len(samp)
    assert ms <= 2 * mf, (ms, mf)


def test_ivf_pq_topk_stays_in_cell(spark, sf_dir):
    """Every IVF-PQ hit lives in the query's cell, distances ascend,
    and the result is the cell-restriction of the global ADC order."""
    from gcp_datalake_utils_spark.sources import load_table
    e = load_table(spark, sf_dir, "embeddings")
    q_label = (e.where(F.col("vec_id") == pq.QUERY_VEC_ID)
               .select("label").first()[0])
    rows = (pq.ivf_pq_topk(spark, sf_dir)
            .orderBy("rank").collect())
    assert 0 < len(rows) <= pq.TOP_K
    assert all(r.label == q_label for r in rows)
    dists = [r.approx_dist for r in rows]
    assert dists == sorted(dists)
    cell_ids = {r.vec_id for r in e.where(F.col("label") == q_label)
                .select("vec_id").collect()}
    adc = sorted(((r.approx_dist, r.vec_id)
                  for r in pq._adc_scores(spark, sf_dir).collect()
                  if r.vec_id in cell_ids))[:pq.TOP_K]
    assert [v for _, v in adc] == [r.vec_id for r in rows]


def test_pq_adc_plan_ships_codes_not_floats(spark, sf_dir):
    """The ADC corpus-side stream must be (vec_id, m, code) joined to
    a BROADCAST lookup table, and the top-k must be a TakeOrdered —
    the plan that makes PQ a memory win at 1e9 vectors."""
    plan = _plan(pq.pq_adc_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
