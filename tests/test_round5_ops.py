"""Round-5 operators: scratch-dir lifecycle, native HLL twin,
bounded-prefix profile, Draw.io line sink, weighted-sample clamp."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# --- pid scratch lifecycle -------------------------------------------------

def test_pid_scratch_wipes_registers_and_sweeps(tmp_path):
    from gcp_datalake_utils_spark.sources import scratch

    root = str(tmp_path / "scr")
    d = scratch.pid_scratch(root, "/some/sf_dir")
    assert os.path.isdir(d)
    assert d.endswith(f"-{os.getpid()}")
    # repeat call wipes content
    open(os.path.join(d, "junk"), "w").write("x")
    d2 = scratch.pid_scratch(root, "/some/sf_dir")
    assert d2 == d and not os.listdir(d)
    # atexit cleanup registered exactly once per path
    assert d in scratch._REGISTERED
    # a dead-pid sibling is swept on the next call ONLY once it has
    # aged past _SWEEP_MIN_AGE_S (cross-PID-namespace guard: a live
    # foreign process can look dead from here). pid 1 is alive — kept
    # even when old; a fresh dead dir is kept; an OLD dead dir goes.
    old = scratch._SWEEP_MIN_AGE_S + 60
    dead_old = os.path.join(root, "abcdef123456-99999999")
    os.makedirs(dead_old)
    os.utime(dead_old, (os.stat(dead_old).st_atime,
                        os.stat(dead_old).st_mtime - old))
    dead_fresh = os.path.join(root, "abcdef123457-99999998")
    os.makedirs(dead_fresh)
    alive_old = os.path.join(root, "abcdef123456-1")
    os.makedirs(alive_old)
    os.utime(alive_old, (os.stat(alive_old).st_atime,
                         os.stat(alive_old).st_mtime - old))
    scratch.pid_scratch(root, "/some/sf_dir")
    assert not os.path.exists(dead_old)
    assert os.path.exists(dead_fresh)
    assert os.path.exists(alive_old)


# --- native HLL twin ---------------------------------------------------------

def test_hll_native_within_tolerance(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import sketches

    rows = sketches.hll_distinct_native(spark, sf_dir).collect()
    assert len(rows) == len(sketches._HLL_COLS)
    assert all(r["within_5pct"] for r in rows)
    assert all(r["exact_distinct"] > 0 for r in rows)


# --- bounded-prefix profile --------------------------------------------------

def test_profile_fast_prefix_bounds_true_extremes(spark, sf_dir):
    """The prefix surrogate must order-agree with the exact string
    extremes: decode(min_pfx) is a prefix-bound of min_str."""
    from gcp_datalake_utils_spark.operators import profile

    exact = {r["column_name"]: r
             for r in profile.profile_orders(spark, sf_dir).collect()}
    fast = {r["column_name"]: r
            for r in profile.profile_orders_fast(spark, sf_dir).collect()}
    assert set(exact) == set(fast)
    for c, kind in profile.PROFILE_COLS:
        e, f_ = exact[c], fast[c]
        assert (e["n_rows"], e["n_nulls"], e["n_distinct"]) == \
            (f_["n_rows"], f_["n_nulls"], f_["n_distinct"])
        if kind == "str":
            def pfx_long(s: str) -> int:
                b = s.encode()[:profile._PFX_BYTES]
                return int.from_bytes(
                    b + b"\x00" * (profile._PFX_BYTES - len(b)), "big")
            assert f_["min_pfx"] == pfx_long(e["min_str"])
            assert f_["max_pfx"] == pfx_long(e["max_str"])
        else:
            assert (e["min_num"], e["max_num"]) == \
                (f_["min_num"], f_["max_num"])
            assert f_["min_pfx"] is None and f_["max_pfx"] is None


# --- Draw.io line sink ---------------------------------------------------------

def test_drawio_lines_document_well_formed(spark):
    import xml.etree.ElementTree as ET

    from gcp_datalake_utils_spark.formatters import diagrams
    from gcp_datalake_utils_spark.operators.classify import (
        classified_columns,
    )
    from gcp_datalake_utils_spark.operators.detection import detect_all

    cls, rels = classified_columns(spark), detect_all(spark)
    lines = diagrams.drawio_lines(spark, cls, rels)
    rows = lines.orderBy("line_no").collect()
    assert rows[0]["line"].startswith("<?xml")
    doc = "\n".join(r["line"] for r in rows)
    root = ET.fromstring(doc)
    cells = root.findall(".//mxCell")
    tables = [c for c in cells if (c.get("id") or "").startswith("tbl_")]
    edges = [c for c in cells if (c.get("id") or "").startswith("rel_")]
    assert len(tables) == cls.select("table_id").distinct().count()
    assert len(edges) == rels.count()
    # line_no is dense 1..N
    assert [r["line_no"] for r in rows] == list(range(1, len(rows) + 1))
    # the string sink is the same document
    assert diagrams.drawio_erd(spark, cls, rels) == doc


# --- weighted-sample clamp -----------------------------------------------------

def test_weighted_sample_key_never_null(spark, sf_dir):
    """No NULL es_key can enter the sample: Spark log(0) is NULL and
    would sort FIRST under asc — the clamp keeps u >= 2^-52."""
    from gcp_datalake_utils_spark.llm import sampling

    top = sampling.weighted_sample(spark, sf_dir)
    assert top.where(F.col("es_key").isNull()).count() == 0


def test_u_clamp_matches_duckdb_at_zero(spark):
    """For the u=0 corner the clamped key must be finite and equal in
    both engines (DuckDB ln(0) = -inf would otherwise sort opposite
    to Spark's NULL)."""
    import duckdb

    eps = 2.0 ** -52
    spark_key = (
        spark.range(1)
        .select(F.round(-F.log(F.greatest(F.lit(0.0), F.lit(eps)))
                        / F.lit(100.0), 9).alias("k"))
        .collect()[0]["k"])
    duck_key = duckdb.sql(
        f"SELECT round(-ln(greatest(0.0, {eps!r})) / 100.0, 9)"
    ).fetchone()[0]
    assert spark_key == duck_key and spark_key > 0
