"""Sketch operators: HyperLogLog distinct + Count-Min heavy hitters."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import sketches
from gcp_datalake_utils_spark.llm.terms import doc_term_pairs
from gcp_datalake_utils_spark.sources import load_table


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """HLL with m=256 has std error ~6.5%; assert every audited column
    lands within 5 sigma (a deterministic dataset either passes
    forever or flags a real hash/register bug)."""
    rows = sketches.hll_distinct(spark, sf_dir).collect()
    assert len(rows) == len(sketches._HLL_COLS)
    for r in rows:
        assert r.exact_distinct > 0
        assert abs(r.rel_error) < 5 * 1.04 / (sketches.HLL_M ** 0.5)


def test_hll_register_sum_matches_python_replica(spark, sf_dir):
    """Bit-for-bit replica of the register pipeline in pure Python for
    one column — catches any drift in the md5-prefix arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = {str(r[0]) for r in li.select("l_orderkey").collect()}
    regs = [0] * sketches.HLL_M
    for v in vals:
        h = hashlib.md5(v.encode()).hexdigest()
        reg = int(h[:2], 16)
        v52 = int(h[2:15], 16)
        rho = 53 if v52 == 0 else 53 - v52.bit_length()
        regs[reg] = max(regs[reg], rho)
    want_sum = sum(1 << (53 - m) for m in regs)
    row = {r.col_name: r
           for r in sketches.hll_distinct(spark, sf_dir).collect()}
    assert row["l_orderkey"].reg_sum == want_sum
    assert row["l_orderkey"].exact_distinct == len(vals)


def test_cms_estimates_dominate_exact(spark, sf_dir):
    """Count-Min guarantee: estimate >= exact for every readout, and
    the top-K readout really is the exact top-K by total frequency."""
    rows = sketches.cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == sketches.CMS_TOP_K
    for r in rows:
        assert r.cm_estimate >= r.exact_tf
        assert r.overestimate == r.cm_estimate - r.exact_tf
    d = load_table(spark, sf_dir, "documents")
    totals = (doc_term_pairs(d).groupBy("term")
              .agg(F.sum("tf").alias("t"))
              .orderBy(F.desc("t"), "term")
              .limit(sketches.CMS_TOP_K).collect())
    want = {(r.term, r.t) for r in totals}
    got = {(r.term, r.exact_tf) for r in rows}
    assert got == want


def test_cms_overestimate_bounded(spark, sf_dir):
    """With w=1024 cells and min-over-4-rows, the overestimate should
    stay well under total_mass * e / w for every heavy hitter."""
    d = load_table(spark, sf_dir, "documents")
    total_mass = (doc_term_pairs(d)
                  .agg(F.sum("tf")).collect()[0][0])
    bound = 2.718281828 * total_mass / sketches.CMS_WIDTH
    for r in sketches.cms_heavy_hitters(spark, sf_dir).collect():
        assert r.overestimate <= bound


def test_prefix_filter_is_complete_and_dominates_minhash(spark, sf_dir):
    """Prefix filtering is exact: its pair set must equal brute-force
    all-pairs Jaccard >= t, and contain every MinHash-LSH pair."""
    from gcp_datalake_utils_spark.llm import dedup
    sh = dedup.shingle_rows(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.s)
    want = set()
    docs = sorted(by_doc)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            inter = len(by_doc[a] & by_doc[b])
            union = len(by_doc[a] | by_doc[b])
            if union and round(inter / union, 6) >= \
                    dedup.JACCARD_THRESHOLD:
                want.add((a, b))
    got = {(r.doc_a, r.doc_b)
           for r in dedup.prefix_filter_pairs(spark, sf_dir).collect()}
    assert got == want
    mh = {(r.doc_a, r.doc_b)
          for r in dedup.near_dup_pairs(spark, sf_dir).collect()}
    assert mh <= got
