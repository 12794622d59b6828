"""Skew evidence (BASELINE.md skew section): measure the orderkey-skewed
fact join on the Zipf corpus (tools/gen_scale.py --zipf) under

  static   — AQE off: the skew-blind shuffle plan; the hot key's
             partition is one straggler task
  aqe      — AQE + skewJoin on (the engine session default): the hot
             partition is split into sub-partitions at runtime
  salted   — explicit 8-way salt of the build side (functions/skew.py),
             the pre-AQE portable fix

The join is lineitem ⋈ orders on orderkey with broadcast disabled (at
100 TB neither fact side broadcasts; on the small demo corpus Spark
would otherwise just broadcast orders and hide the skew entirely).

Usage: python tools/skew_bench.py [sf_dir] (default tmp/sfskew)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tmp", "sfskew")

    from gcp_datalake_utils_spark.functions.skew import salted_join
    from gcp_datalake_utils_spark.session import get_spark
    from gcp_datalake_utils_spark.sources import load_table

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def fact_join():
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
                .agg(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))).alias("rev"),
                     F.count("*").alias("n")))

    def fact_join_salted():
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders") \
            .withColumnRenamed("o_orderkey", "l_orderkey")
        j = salted_join(li, o, "l_orderkey", n=8)
        return j.agg(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))).alias("rev"),
                     F.count("*").alias("n"))

    def timed(mk, reps: int = 3) -> float:
        mk().write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return round(statistics.median(ts), 3)

    results: dict[str, float] = {}

    # static: the skew-blind plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    results["static"] = timed(fact_join)

    # AQE skew-join split. The split thresholds are scaled to the demo
    # corpus: the defaults (256 MB skewedPartitionThresholdInBytes)
    # target real cluster partitions, and the demo's ~200 MB hot
    # partition would sit just under them — at 100 TB the hot partition
    # is GBs and the DEFAULTS fire; here we scale thresholds down so the
    # same mechanism is exercised, not bypassed.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   "16m")
    results["aqe"] = timed(fact_join)

    # salted (also under AQE; the salt pre-splits, AQE has nothing to do)
    results["salted"] = timed(fact_join_salted)

    # sanity: all three agree on the answer
    rows = {k: tuple(mk().collect()[0])
            for k, mk in [("plain", fact_join),
                          ("salted", fact_join_salted)]}
    assert rows["plain"][1] == rows["salted"][1], rows

    print(json.dumps({"sf_dir": sf_dir, "join": "lineitem*orders",
                      "times": results,
                      "rows_joined": rows["plain"][1],
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
