"""Round-14 optimization-equivalence and driver-red hardening tests.

The r13 driver gate recorded image_dhash hash_match=false at sf0.01
(291/291 rows) — never reproduced locally (see
plans/r14/image_dhash_red_note.md). These tests pin the LIVE execution
path (vanilla-config Spark session -> fan_out -> mapInPandas -> Arrow
collect) against both the DuckDB oracle and a literal hash constant,
so a drift in either engine — or in both together — fails a committed
test instead of only the driver's gate.
"""
from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"

# table_hash of IMAGE_DHASH_ORACLE at sf0.001 (302 rows), pinned
# 2026-08-18 under duckdb 1.0.0 == live Spark run at 8 and 32 cores.
_IMAGE_DHASH_SF0001_HASH = "124434affc8d08f4cbfb26f1b1fdef1a"


@pytest.fixture(scope="module")
def spark():
    from gcp_datalake_utils_spark.session import get_spark
    s = get_spark("test-r14-opt")
    s.sparkContext.setLogLevel("ERROR")
    return s


# --- image_dhash live-path pin (r13 driver-red, VERDICT item 1) -------------

def test_image_dhash_live_path_pinned(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from tools.check import run_duck, table_hash

    sdf = entry_mod.queries()["image_dhash"](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    shash = table_hash(srows, sdf.columns)
    drows, dcols = run_duck(entry_mod.oracle_sql()["image_dhash"], SF_DIR)
    assert len(srows) == len(drows) == 302
    assert shash == table_hash(drows, dcols)
    assert shash == _IMAGE_DHASH_SF0001_HASH


def test_dhash_rejects_undersized_input():
    from gcp_datalake_utils_spark.llm.imagededup import _dhash_of
    with pytest.raises(ValueError, match="dHash needs"):
        _dhash_of(np.zeros((7, 32), dtype=np.uint8))
    with pytest.raises(ValueError, match="dHash needs"):
        _dhash_of(np.zeros((8, 8), dtype=np.uint8))


def test_dhash_integral_image_check_agrees():
    # the dual-path guard must be silent on arbitrary inputs: if the
    # reduceat and integral-image block sums ever disagree, _dhash_of
    # raises instead of returning
    from gcp_datalake_utils_spark.llm.imagededup import _dhash_of
    rng = np.random.default_rng(14)
    for _ in range(25):
        h = int(rng.integers(8, 400))
        w = int(rng.integers(9, 64))
        pix = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        hi, lo = _dhash_of(pix)
        assert 0 <= hi < 2 ** 32 and 0 <= lo < 2 ** 32


# --- file-listing partition probe (VERDICT item 6) ---------------------------

def test_parse_size_bytes():
    from gcp_datalake_utils_spark.sources.registry import _parse_size_bytes
    assert _parse_size_bytes("134217728b") == 134217728
    assert _parse_size_bytes("128m") == 128 << 20
    assert _parse_size_bytes("1g") == 1 << 30
    assert _parse_size_bytes("4194304") == 4 << 20


def test_scan_partition_probe_file_backed(spark, tmp_path):
    from gcp_datalake_utils_spark.sources.registry import (
        _estimated_scan_partitions, scaled_repartition)
    target = spark.sparkContext.defaultParallelism
    single = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # small single-file scan: estimated below target, fan-out fires
    assert _estimated_scan_partitions(single) < target
    out = scaled_repartition(single.select("doc_id"), "doc_id")
    assert out.rdd.getNumPartitions() == target
    # multi-file source at/above the packing estimate: untouched
    p = str(tmp_path / "many")
    spark.range(100_000).repartition(target + 4, "id").write.parquet(p)
    many = spark.read.parquet(p)
    assert _estimated_scan_partitions(many) >= target
    kept = scaled_repartition(many, "id")
    assert kept is many  # no exchange added


# --- driver-side PQ sample training (VERDICT item 7) -------------------------

def test_pq_driver_train_matches_declarative_chain(spark):
    # the numpy driver-side Lloyd rounds must be BIT-identical to the
    # r13 declarative Spark chain (same round-6 distances, struct-min
    # ties, _davg6 decimal means, empty-code drop rule)
    from pyspark.sql import functions as F
    from gcp_datalake_utils_spark.llm import pq
    from gcp_datalake_utils_spark.sources import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    low = (e.orderBy("vec_id").limit(pq.PQ_TRAIN_SAMPLE)
           .select("vec_id"))
    sub_s = pq._subvectors(e).join(F.broadcast(low), "vec_id")
    cents = pq._pq_seed(e)
    for _ in range(pq.PQ_ITERS):
        assign = pq._pq_assign(sub_s, cents)
        cents = pq._pq_update(sub_s, assign)
    decl = {(r.m, r.code): tuple(r.centroid) for r in cents.collect()}
    drv, _ = pq._pq_train_sampled(e)
    got = {(r.m, r.code): tuple(r.centroid) for r in drv.collect()}
    assert got == decl


def test_png_roundtrip_guard_fires_on_divergence():
    # simulate a worker-env codec divergence: a decoded image that does
    # not equal the source pixels must raise with the asset id, not
    # hash silently (the guard lives in _dhash_rows' kernel)
    from gcp_datalake_utils_spark.llm.multimodal import (
        build_png_batch, parse_png)
    pix = np.arange(8 * 32, dtype=np.uint8).reshape(8, 32)
    png = build_png_batch([pix])[0]
    img, _ = parse_png(png)
    assert np.array_equal(img, pix)  # lossless round trip holds here
