"""Time a subset of registry queries at a given sf_dir (scale-curve
evidence for BASELINE.md). Protocol: one discarded warm-up, then
median of N timed runs (default 3; use N=1 for the expensive sf10
rows, marked in BASELINE.md).

Usage: python tools/scale_sweep.py SF_DIR N q1 [q2 ...]
Prints one JSON line {"sf_dir": ..., "runs": N, "spark": {q: sec}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

COLLECT_CAP = 100_000


def main() -> None:
    sf_dir, n = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    from gcp_datalake_utils_spark.session import get_spark
    from gcp_datalake_utils_spark import queries_registry as qr
    spark = get_spark("scale_sweep", shuffle_partitions=32)
    out = {}
    for name in names:
        fn = qr.QUERIES[name]
        try:
            n_rows = fn(spark, sf_dir).count()  # warm-up; sizes the run
            small = n_rows <= COLLECT_CAP
            times = []
            for _ in range(n):
                t0 = time.time()
                df = fn(spark, sf_dir)
                if small:
                    df.collect()
                else:
                    # NOT count(): Catalyst eliminates row-preserving
                    # joins/projections under count, so count-mode would
                    # time a parquet row-count, not the operator. The
                    # noop sink forces every row+column to materialize.
                    df.write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
            out[name] = round(statistics.median(times), 3)
            print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — long sweeps must survive
            out[name] = None
            print(f"  {name}: FAILED {e}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": n, "spark": out,
                      "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
