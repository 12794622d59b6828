"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> [query ...]      # default: bench HEADLINE
    SPARK_GRAFT_SF_DIR picks the data dir (default /root/testdata/sf0.1)

Writes plans/<tag>/<query>.txt with the formatted physical plan plus a
one-line summary (n_exchanges, join strategies, python-eval nodes) so
plan-shape regressions diff cleanly.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    only = sys.argv[2:]
    import bench
    import __spark_entry__ as entry
    from gcp_datalake_utils_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    names = only or bench.HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        pyev = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)", plan)))
        hdr = (f"# query: {name}\n# exchanges: {n_ex}\n"
               f"# joins: {joins}\n# python: {pyev}\n\n")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(hdr + plan)
        print(f"{name}: exchanges={n_ex} joins={joins} python={pyev}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
