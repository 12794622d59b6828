"""Physical-plan guards: the scale-critical plan properties asserted so
regressions surface in CI, not at 100 TB (docs/PLANS.md rationale)."""

from __future__ import annotations

from gcp_datalake_utils_spark.operators import payload


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution \
        .ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = _formatted_plan(payload.pricing_summary(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan, "filter not pushed"
    # projection pruned: the unused l_partkey must not be scanned
    read_schema = [ln for ln in plan.splitlines()
                   if "ReadSchema" in ln][0]
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_revenue_join_build_sides_broadcast(spark, sf_dir):
    plan = _formatted_plan(payload.revenue_by_nation(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, \
        "dimension joins must broadcast at test scale"
    assert "CartesianProduct" not in plan


def test_top_orders_single_window_shuffle(spark, sf_dir):
    plan = _formatted_plan(payload.top_orders_per_customer(spark, sf_dir))
    assert "Window" in plan
    # exactly one exchange: the partitionBy(custkey) shuffle
    assert plan.count("Exchange") <= 2
