"""Round-7 additions: Arrow repetition twin, force-layout coordinates,
rule-compiler truth table, approx profile."""

from __future__ import annotations

from gcp_datalake_utils_spark.formatters import layout
from gcp_datalake_utils_spark.llm import text
from gcp_datalake_utils_spark.operators import profile
from gcp_datalake_utils_spark.rules import compiler as rc


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_repetition_arrow_bit_identical_to_jvm(spark, sf_dir):
    jvm = _sorted_rows(text.repetition_flags(spark, sf_dir))
    arrow = _sorted_rows(text.repetition_flags_arrow(spark, sf_dir))
    assert len(jvm) == len(arrow) > 0
    for a, b in zip(jvm, arrow):
        # bit-identical, not approx: same tokenization, same HALF_UP
        # rounding over the shortest-decimal representation
        assert a == b


def test_repetition_arrow_no_exchange(spark, sf_dir):
    plan = text.repetition_flags_arrow(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_force_layout_matches_physics_dict(spark):
    df = layout.force_layout_coords(spark)
    rows = {r["table_id"]: (r["x"], r["y"]) for r in df.collect()}
    pos = layout.force_positions(spark)
    assert set(rows) == set(pos)
    for t, (x, y) in pos.items():
        assert rows[t] == (round(x, 3), round(y, 3))
    # every table placed, no NaNs, non-degenerate spread
    xs = [x for x, _ in rows.values()]
    assert max(xs) - min(xs) > 1.0


def test_rule_compiler_truth_branches_hit(spark):
    df = rc.rule_compiler_truth(spark)
    rows = df.collect()
    assert len(rows) > 0
    # every wildcard branch must actually fire somewhere in the
    # fixtures, otherwise the truth table is not exercising P6
    for flag in ["w_exact", "w_suffix", "w_prefix", "w_multi",
                 "file_pk", "file_fk", "dw_pk", "dv_fk", "common_pk"]:
        assert any(r[flag] for r in rows), f"no fixture hits {flag}"
    # base_name strips key suffixes
    stripped = {r["name"]: r["base_name"] for r in rows}
    for name, base in stripped.items():
        low = name.lower()
        if low.endswith("_id"):
            assert base == low[:-3]


def test_rules_file_roundtrip_compiles_identically():
    from gcp_datalake_utils_spark.rules.config import PatternConfig
    cfg = PatternConfig.from_dict(rc.TRUTH_RULES_FILE)
    assert cfg.pk_indicators == ("id", "key", "pk")
    assert "l_" in cfg.table_patterns
    assert cfg.table_patterns["dim_"]["pk"] == ("*_key", "sk")
    # the compiled predicate is dialect-complete: spark + duck emit
    # the same structure with dialect-specific function names
    s = rc.pk_sql("spark", cfg)
    d = rc.pk_sql("duck", cfg)
    assert "startswith" in s and "starts_with" in d


def test_profile_orders_approx_accuracy(spark, sf_dir):
    exact = {r["column_name"]: r["n_distinct"]
             for r in profile.profile_orders_fast(spark, sf_dir).collect()}
    approx_rows = profile.profile_orders_approx(spark, sf_dir).collect()
    assert len(approx_rows) == len(profile.PROFILE_COLS)
    for r in approx_rows:
        e = exact[r["column_name"]]
        assert abs(r["n_distinct_approx"] - e) <= max(0.10 * e, 2)


def test_profile_orders_approx_no_expand(spark, sf_dir):
    plan = profile.profile_orders_approx(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "SortAggregate" not in plan


def test_kmeans_arrow_bit_identical_to_jvm(spark, sf_dir):
    """The Arrow-assignment k-means must return the identical
    (vec_id, cluster, cosine) table as the declarative JVM chain —
    same centroids at every iteration, same final argmax."""
    from gcp_datalake_utils_spark.llm import similarity, similarity_arrow
    jvm = _sorted_rows(similarity.kmeans_iterate(spark, sf_dir))
    arrow = _sorted_rows(
        similarity_arrow.kmeans_iterate_arrow(spark, sf_dir))
    assert len(jvm) == len(arrow) > 0
    assert jvm == arrow


def test_kmeans_arrow_final_plan_shape(spark, sf_dir):
    """The returned plan is ONE Arrow pass over the corpus: no
    centroid crossJoin fan-out, no argmax groupBy exchange, no
    broadcast chain (iterations already ran driver-coordinated)."""
    from gcp_datalake_utils_spark.llm import similarity_arrow
    plan = similarity_arrow.kmeans_iterate_arrow(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_arrow_bit_identical_to_jvm(spark, sf_dir):
    """The broadcast-model scorer must return the identical
    (doc_id, n_bigrams, avg_logprob) table as the join-shaped JVM
    twin — same tokenization, same round-9 logprobs, same exact sum."""
    from gcp_datalake_utils_spark.llm import lm
    jvm = _sorted_rows(lm.lm_doc_scores(spark, sf_dir))
    arrow = _sorted_rows(lm.lm_doc_scores_arrow(spark, sf_dir))
    assert len(jvm) == len(arrow) > 0
    assert jvm == arrow


def test_lm_arrow_scoring_plan_is_narrow(spark, sf_dir):
    """The returned scoring plan is one Arrow pass over documents:
    no joins, no exchanges (the model already rode in as a closure
    constant)."""
    from gcp_datalake_utils_spark.llm import lm
    plan = lm.lm_doc_scores_arrow(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_lm_bins_arrow_bit_identical_to_jvm(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import lm
    jvm = _sorted_rows(lm.lm_quality_bins(spark, sf_dir))
    arrow = _sorted_rows(lm.lm_quality_bins_arrow(spark, sf_dir))
    assert len(jvm) == len(arrow) > 0
    assert jvm == arrow


def test_value_percentiles_approx_rank_bracket(spark, sf_dir):
    """The GK sketch's contract is RANK error, not value error (it
    returns an actual data value; the exact anchor interpolates, so
    value-space gaps on sparse tails are expected). Assert each
    approx percentile lies between the exact interpolated percentiles
    at p +/- 0.02 rank — far wider than the sketch's 1e-4 bound but
    tight enough to catch a wrong quantile."""
    from pyspark.sql import functions as F
    from gcp_datalake_utils_spark.operators import payload
    from gcp_datalake_utils_spark.sources import load_events
    e = load_events(spark, sf_dir)
    brackets = {r["event_type"]: r for r in e.groupBy("event_type").agg(
        *[F.percentile("value", F.lit(p)).alias(f"q{int(p*10000)}")
          for p in (0.48, 0.52, 0.93, 0.97, 0.975)],
        F.max("value").alias("qmax")).collect()}
    rows = payload.value_percentiles_approx(spark, sf_dir).collect()
    exact_n = {r["event_type"]: r["n"]
               for r in payload.value_percentiles(spark, sf_dir).collect()}
    assert len(rows) == len(brackets) > 0
    for r in rows:
        b = brackets[r["event_type"]]
        assert r["n"] == exact_n[r["event_type"]]
        assert b["q4800"] - 1e-9 <= r["p50"] <= b["q5200"] + 1e-9
        assert b["q9300"] - 1e-9 <= r["p95"] <= b["q9700"] + 1e-9
        assert b["q9750"] - 1e-9 <= r["p99"] <= b["qmax"] + 1e-9


def test_quantize_arrow_bit_identical_to_jvm(spark, sf_dir):
    """Same int8 grid, same recon_err fold, same string form."""
    from gcp_datalake_utils_spark.llm import similarity, similarity_arrow
    jvm = _sorted_rows(similarity.embedding_quantize(spark, sf_dir))
    arrow = _sorted_rows(
        similarity_arrow.embedding_quantize_arrow(spark, sf_dir))
    assert len(jvm) == len(arrow) > 0
    assert jvm == arrow


def test_label_centroids_arrow_bit_identical_to_jvm(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import similarity, similarity_arrow
    jvm = _sorted_rows(similarity.label_centroids(spark, sf_dir))
    arrow = _sorted_rows(
        similarity_arrow.label_centroids_arrow(spark, sf_dir))
    assert len(jvm) == len(arrow) > 0
    assert jvm == arrow
