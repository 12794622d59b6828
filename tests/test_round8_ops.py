"""Round-8 operators: revenue pre-agg twin, bucketed nesting, pruned
LM model, auto-scaled near-dup band width, G5 layout truth table."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gcp_datalake_utils_spark.functions import scale_demos
from gcp_datalake_utils_spark.llm import lm, similarity
from gcp_datalake_utils_spark.operators import nested


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- revenue_by_nation_preagg ------------------------------------------

def test_preagg_matches_bucketed_twin(spark, sf_dir):
    a = {tuple(r) for r in
         scale_demos.revenue_by_nation_preagg(spark, sf_dir).collect()}
    b = {tuple(r) for r in
         scale_demos.revenue_by_nation_bucketed(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_preagg_plan_no_expand_one_exchange(spark, sf_dir):
    plan = _executed_plan(
        scale_demos.revenue_by_nation_preagg(spark, sf_dir))
    assert "Expand" not in plan, "exact-distinct Expand crept back"
    # the ONLY hash exchange is the final nation rollup; the per-order
    # agg and the orders join run on the bucketed layout
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "ShuffledHashJoin" in plan


# --- order_lines_nested_bucketed ---------------------------------------

def test_nested_bucketed_matches_shuffle_twin(spark, sf_dir):
    a = {tuple(r) for r in
         nested.order_lines_nested_bucketed(spark, sf_dir).collect()}
    b = {tuple(r) for r in
         nested.order_lines_nested(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_nested_bucketed_plan_zero_exchange(spark, sf_dir):
    plan = _executed_plan(
        nested.order_lines_nested_bucketed(spark, sf_dir))
    assert "Exchange" not in plan, \
        "bucket-local nesting must not shuffle the corpus"


# --- lm_doc_scores_pruned ----------------------------------------------

def test_pruned_model_is_strictly_smaller(spark, sf_dir):
    """The min-count filter must actually bound the driver model: the
    surviving bigram count is strictly below the distinct total (this
    corpus, like any Zipf text, is mostly hapax bigrams)."""
    bg = lm._bigram_rows(spark, sf_dir)
    counts = bg.groupBy("bg").agg(F.count("*").alias("c"))
    total = counts.count()
    kept = counts.where(F.col("c") >= lm.LM_MIN_COUNT).count()
    assert 0 < kept < total


def test_pruned_scores_subset_of_unpruned(spark, sf_dir):
    """Every bigram the pruned model scores is scored identically by
    the unpruned twin, so per-doc n_scored <= n_bigrams, with equality
    exactly when none of the doc's bigrams were pruned."""
    pruned = {r["doc_id"]: r for r in
              lm.lm_doc_scores_pruned(spark, sf_dir).collect()}
    full = {r["doc_id"]: r for r in
            lm.lm_doc_scores_arrow(spark, sf_dir).collect()}
    assert set(pruned) == set(full)
    assert any(pruned[d]["n_scored"] < full[d]["n_bigrams"]
               for d in pruned)
    for d, p in pruned.items():
        assert p["n_scored"] <= full[d]["n_bigrams"]
        if p["n_scored"] == 0:
            assert p["avg_logprob"] is None


# --- embedding_near_dups_auto ------------------------------------------

def test_auto_band_bits_grows_with_corpus():
    assert similarity._auto_band_bits(1_000) == 8
    assert similarity._auto_band_bits(100_000) == 11
    assert similarity._auto_band_bits(1_000_000) == 14
    assert similarity._auto_band_bits(10_000_000) == 16
    # clamp: never past 16 (the next lever is more bands, not wider
    # keys — docstring contract)
    assert similarity._auto_band_bits(10**12) == 16


def test_auto_near_dups_planted_pair_recall(spark, sf_dir):
    """Planted near-identical pairs must survive the widened banding:
    duplicate 30 corpus vectors with tiny noise and assert the auto
    operator reports every planted pair (cosine ~ 1 >= 0.95, and a
    near-identical pair collides in every band with prob ~ 1)."""
    import numpy as np

    e = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("vec_id", "label", "embedding"))
    base = e.orderBy("vec_id").limit(30).collect()
    max_id = e.agg(F.max("vec_id")).collect()[0][0]
    rng = [(int(max_id + 1 + i), r["label"],
            [float(x) + 1e-6 * ((i + j) % 3 - 1)
             for j, x in enumerate(r["embedding"])])
           for i, r in enumerate(base)]
    planted = spark.createDataFrame(
        rng, "vec_id long, label int, embedding array<float>")
    corpus = e.unionByName(planted)

    import gcp_datalake_utils_spark.sources as src
    orig = src.load_table
    try:
        src.load_table = lambda s, d, name: (
            corpus if name == "embeddings" else orig(s, d, name))
        similarity.load_table = src.load_table
        pairs = {(r["vec_a"], r["vec_b"]) for r in
                 similarity.embedding_near_dups_auto(spark, sf_dir)
                 .collect()}
    finally:
        src.load_table = orig
        similarity.load_table = orig
    for i, r in enumerate(base):
        assert (r["vec_id"], max_id + 1 + i) in pairs, \
            f"planted pair for vec {r['vec_id']} lost by banding"


# --- grid_layout_coords -------------------------------------------------

def test_grid_layout_three_layouts_per_table(spark):
    from gcp_datalake_utils_spark.formatters import layout
    rows = layout.grid_layout_coords(spark).collect()
    per_table: dict = {}
    for r in rows:
        per_table.setdefault(r["table_id"], set()).add(r["layout"])
    assert all(v == {"grid", "row", "column"} for v in per_table.values())
    # row layout is a horizontal band: y == 0 everywhere
    assert all(r["y"] == 0.0 for r in rows if r["layout"] == "row")
    assert all(r["x"] == 0.0 for r in rows if r["layout"] == "column")
