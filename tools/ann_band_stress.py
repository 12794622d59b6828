"""Stress the auto-band near-dup knob (r8 verdict ask #6): candidate
count + wall time of embedding_near_dups_auto at vector counts past
the driver corpora, including the bits=16 clamp regime.

Usage: python tools/ann_band_stress.py VEC_DIR [VEC_DIR ...]
(corpora from `python tools/gen_scale.py --vecs K out_dir`).
Prints one JSON line per corpus:
  {"sf_dir":..., "n":..., "labels":..., "bits":..., "candidates":...,
   "cand_sec":..., "full_sec":..., "pairs":...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def stress(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from gcp_datalake_utils_spark.llm import similarity as S
    from gcp_datalake_utils_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    bits, bands = S._auto_band_plan(n)
    labs = e.select(F.countDistinct("label")).collect()[0][0]

    t0 = time.time()
    n_cand = S._banded_candidates(e, bits, bands).count()
    t_cand = time.time() - t0
    t0 = time.time()
    pairs = S.embedding_near_dups_auto(spark, sf_dir).count()
    t_full = time.time() - t0
    return {"sf_dir": sf_dir, "n": n, "labels": labs, "bits": bits,
            "bands": bands,
            "candidates": n_cand, "cand_sec": round(t_cand, 1),
            "full_sec": round(t_full, 1), "pairs": pairs}


def main() -> None:
    from gcp_datalake_utils_spark.session import get_spark
    spark = get_spark("ann_band_stress", shuffle_partitions=32)
    for sf_dir in sys.argv[1:]:
        print(json.dumps(stress(spark, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
