"""PQ at stress scale: build the index (train + encode) over a large
vector corpus, persist codes to a parquet scratch store (the
production form — NOT localCheckpoint, per the round-12 memory
lesson), then time the ADC serving path against the prebuilt store.

Usage: python tools/pq_stress.py VEC_DIR [--duck-timeout S] [--sample]
  --sample: train codebooks on the PQ_TRAIN_SAMPLE lowest ids and
  encode with ONE corpus pass via the Arrow kernel (the production
  build — pq_codes_sampled + pq_codes_arrow composed)
Prints one JSON line:
  {"sf_dir":..., "n":..., "build_sec":..., "serve_sec":...,
   "codes_bytes":..., "float_bytes":..., "compression":...,
   "duck_train_sec":... | null (DNF)}

The DuckDB twin runs the SAME training chain (PQ_CODES_ORACLE) on
the same corpus under a wall cap — the single-node cost the
distributed build is measured against.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from gcp_datalake_utils_spark.llm import pq
    from gcp_datalake_utils_spark.session import get_spark
    from gcp_datalake_utils_spark.sources import load_table

    sf_dir = sys.argv[1]
    duck_timeout = 0.0
    if "--duck-timeout" in sys.argv:
        duck_timeout = float(
            sys.argv[sys.argv.index("--duck-timeout") + 1])

    spark = get_spark("pq_stress", shuffle_partitions=32)
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()

    # no leading underscore: Spark's file listing treats _-prefixed
    # paths as hidden metadata and can ignore them on read
    store = os.path.join(sf_dir, "pq_store")
    shutil.rmtree(store, ignore_errors=True)

    # --- index build: train codebooks, encode every vector, persist
    sampled = "--sample" in sys.argv
    t0 = time.time()
    if sampled:
        # sample-sized Lloyd, then ONE corpus pass: the narrow Arrow
        # encode kernel (pq_codes_arrow) against the collected books
        cents, _ = pq._pq_train_sampled(e)
        cent_rows = cents.collect()
        import numpy as np

        books = {}
        for r in cent_rows:
            books.setdefault(r.m, []).append(
                (r.code, np.asarray(r.centroid, dtype=np.float64)))
        books = {m: (np.array([c for c, _ in sorted(v)]),
                     np.stack([a for _, a in sorted(v)]))
                 for m, v in books.items()}

        def encode(batches):
            import pandas as pd
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    pdf["embedding"].to_numpy()).astype(np.float64)
                out = np.zeros((len(x), pq.PQ_M), dtype=np.int32)
                for m in range(pq.PQ_M):
                    ids, cm = books[m]
                    s = x[:, m * pq.PQ_SUB:(m + 1) * pq.PQ_SUB]
                    d = ((s[:, None, :] - cm[None, :, :]) ** 2).sum(2)
                    out[:, m] = ids[d.argmin(axis=1)]
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "codes": out.tolist()})

        codes = e.select("vec_id", "embedding").mapInPandas(
            encode, "vec_id long, codes array<int>")
    else:
        cents, assign = pq._pq_train(e)
        codes = (assign.groupBy("vec_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("m", "code"))),
                     lambda s: s["code"]).alias("codes")))
    codes.write.mode("overwrite").parquet(store)
    if not sampled:
        cent_rows = cents.collect()  # 128-row model table
    build_sec = time.time() - t0

    # --- ADC serving against the prebuilt store
    q = (e.where(F.col("vec_id") == pq.QUERY_VEC_ID)
         .select("embedding").first()[0])
    lut = []
    for r in cent_rows:
        qs = [float(x) for x in q[r.m * pq.PQ_SUB:(r.m + 1) * pq.PQ_SUB]]
        d = round(sum((a - b) * (a - b)
                      for a, b in zip(qs, r.centroid)), 6)
        lut.append((r.m, r.code, d))
    t0 = time.time()
    lut_df = spark.createDataFrame(lut, "m int, code int, d double")
    stored = spark.read.parquet(store)
    per_m = stored.select(
        "vec_id", F.posexplode("codes").alias("m", "code"))
    top = (per_m.where(F.col("vec_id") != pq.QUERY_VEC_ID)
           .join(F.broadcast(lut_df), ["m", "code"])
           .groupBy("vec_id")
           .agg(F.round(F.sum(F.col("d").cast("decimal(18,6)"))
                        .cast("double"), 6).alias("approx_dist"))
           .orderBy("approx_dist", "vec_id").limit(pq.TOP_K)
           .collect())
    serve_sec = time.time() - t0
    assert len(top) == pq.TOP_K

    codes_bytes = _dir_bytes(store)
    float_bytes = _dir_bytes(sf_dir) - codes_bytes

    # --- DuckDB twin: same training chain, wall-capped
    duck_sec = None
    if duck_timeout > 0:
        import duckdb
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')")
        timer = threading.Timer(duck_timeout, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(
                f"SELECT count(*) FROM ({pq.PQ_CODES_ORACLE})"
            ).fetchall()
            duck_sec = round(time.time() - t0, 3)
        except duckdb.Error as ex:
            print(f"  duck DNF: {ex}", file=sys.stderr, flush=True)
        finally:
            timer.cancel()

    shutil.rmtree(store, ignore_errors=True)
    print(json.dumps({
        "sf_dir": sf_dir, "n": n,
        "build_sec": round(build_sec, 3),
        "serve_sec": round(serve_sec, 3),
        "codes_bytes": codes_bytes, "float_bytes": float_bytes,
        "compression": round(float_bytes / max(codes_bytes, 1), 2),
        "duck_train_sec": duck_sec}), flush=True)


if __name__ == "__main__":
    main()
