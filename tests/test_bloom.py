"""Bloom pre-filter audit operator."""

from __future__ import annotations

from gcp_datalake_utils_spark.functions import bloom
from gcp_datalake_utils_spark.sources import load_table


def test_bloom_never_false_negative(spark, sf_dir):
    rows = bloom.bloom_prefilter_audit(spark, sf_dir).collect()
    cells = {(r.bloom_pass, r.is_member): r.n_orders for r in rows}
    assert (False, True) not in cells  # Bloom guarantee
    assert cells.get((True, True), 0) > 0
    total = sum(cells.values())
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert total == n_orders


def test_bloom_fp_rate_near_theory(spark, sf_dir):
    """FP rate ~ fill^k; assert within 3x of theory (deterministic
    data: either stable forever or a real hashing bug)."""
    rows = bloom.bloom_prefilter_audit(spark, sf_dir).collect()
    cells = {(r.bloom_pass, r.is_member): r.n_orders for r in rows}
    cust = (load_table(spark, sf_dir, "customer")
            .where(f"c_acctbal > {bloom.BAL_MIN}").count())
    fill = 1.0 - (1.0 - 1.0 / bloom.BLOOM_M) ** (bloom.BLOOM_K * cust)
    theory = fill ** bloom.BLOOM_K
    non_members = (cells.get((True, False), 0)
                   + cells.get((False, False), 0))
    if non_members:
        fp = cells.get((True, False), 0) / non_members
        assert fp < 3 * theory + 0.01
