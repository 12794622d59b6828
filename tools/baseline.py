"""Measure the DuckDB baseline (BASELINE.md protocol): run each headline
query's ORACLE SQL in DuckDB at sf0.1, one discarded warm-up then median
of 3. Prints a markdown table row set + JSON."""

from __future__ import annotations

import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import os
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from bench import HEADLINE  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')")
    only = sys.argv[1:]
    per_query = {}
    for name in (only or HEADLINE):
        if name not in oracles:
            continue  # rows-only queries (e.g. approx sketches)
        sql = oracles[name]
        con.execute(sql).fetchall()  # warm-up
        times = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        per_query[name] = round(statistics.median(times), 3)
    print(json.dumps({"sf_dir": SF_DIR, "duckdb": per_query,
                      "total": round(sum(per_query.values()), 3)}))


if __name__ == "__main__":
    main()
