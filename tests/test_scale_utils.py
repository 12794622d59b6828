"""Scale utilities: salted joins, two-phase aggregation, bucketed
layouts — correctness plus the plan property each exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.functions import skew
from gcp_datalake_utils_spark.sources import bucketing, load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o, "l_orderkey").agg(
        F.count("*"), F.round(F.sum("o_totalprice"), 2)).collect()[0]
    salted = skew.salted_join(li, o, "l_orderkey", n=4).agg(
        F.count("*"), F.round(F.sum("o_totalprice"), 2)).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_salted_join_spreads_hot_key(spark):
    # one key carries 10k rows; the salted shuffle key has 4 variants
    fact = spark.range(10000).select(
        F.lit(1).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(1, "hot")], "k int, name string")
    out = skew.with_salt(fact, 4, salt_source=F.col("v"))
    n_salts = out.select(skew.SALT_COL).distinct().count()
    assert n_salts == 4
    joined = skew.salted_join(fact, dim, "k", n=4,
                              salt_source=F.col("v"))
    assert joined.count() == 10000


def test_salted_join_rejects_non_fact_preserving(spark):
    fact = spark.range(10).select(F.lit(1).alias("k"))
    dim = spark.createDataFrame([(1, "x")], "k int, name string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        skew.salted_join(fact, dim, "k", n=4, how="right")
    with _pytest.raises(ValueError):
        skew.with_salt(fact, 0)


def test_salted_left_join_preserves_unmatched_facts(spark):
    fact = spark.createDataFrame([(1,), (2,)], "k int")
    dim = spark.createDataFrame([(1, "x")], "k int, name string")
    out = skew.salted_join(fact, dim, "k", n=4, how="left").collect()
    assert len(out) == 2
    assert {r.k for r in out if r.name is None} == {2}


def test_two_phase_agg_merges_exactly(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = (li.groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("sum_l_quantity"),
                  F.count("l_quantity").alias("count_l_quantity"))
             .orderBy("l_orderkey").limit(5).collect())
    two = (skew.two_phase_agg(
        li, "l_orderkey", 4,
        {"l_quantity": "sum", "l_partkey": "count"},
        salt_source=F.col("l_linenumber"))
        .orderBy("l_orderkey").limit(5).collect())
    for p, t in zip(plain, two):
        assert p["l_orderkey"] == t["l_orderkey"]
        assert abs(p["sum_l_quantity"] - t["sum_l_quantity"]) < 1e-9
        # count partials must merge by SUM, not count-of-partials
        assert p["count_l_quantity"] == t["count_l_partkey"]


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # managed tables land in the session warehouse dir (set to /tmp by
    # the session factory; warehouse.dir is a static conf)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    bucketing.write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    bucketing.write_bucketed(o, "b_orders", "o_orderkey", buckets=8)
    # disable broadcast so the planner must consider the shuffle it
    # would otherwise need — bucketing removes it
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(
            spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
        # both sides bucketed on the join key with equal bucket counts:
        # the join plans without any shuffle exchange
        assert not bucketing.plan_has_shuffle(joined)
        # whereas the raw (unbucketed) join does shuffle
        raw = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        assert bucketing.plan_has_shuffle(raw)
        plain = raw.count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
