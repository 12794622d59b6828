"""Arrow-vectorized brute-force cosine top-k (the Pandas-UDF scale
path).

`similarity.cosine_topk` evaluates the dot product as a JVM
higher-order-function fold — the r3 plan audit showed that shape is
already optimal (TakeOrderedAndProject, no shuffle of the corpus) but
the per-element fold is interpreted expression eval, ~10x slower than
a vectorized kernel at sf1. This module is the documented answer when
that constant factor matters: score each Arrow batch with one numpy
matrix-vector product inside ``mapInPandas``, keep everything else
(filter, global top-k, rank) identical.

Why this is the right 100 TB shape:
- the kernel is embarrassingly parallel and allocation-free per batch
  (one ``stack``, one GEMV); Arrow moves columns, not rows;
- the scored stream still feeds ``orderBy().limit(k)`` =
  TakeOrderedAndProject — each partition ships only its local top-k;
- the query vector rides in as a closure constant (one row collected
  driver-side — it IS the query parameter), never a join.

The score is rounded to 6 before ranking, so numpy's pairwise
summation and the JVM/DuckDB sequential folds agree — the same
cross-engine tolerance contract every float in the repo uses.
Oracle: identical to cosine_topk (same result by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.similarity import (
    QUERY_VEC_ID,
    _topk_ranked,
)
from gcp_datalake_utils_spark.sources import load_table

_SCHEMA = "vec_id long, label int, cosine double"


def cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] brute-force cosine top-k, numpy-scored per Arrow batch."""
    e = load_table(spark, sf_dir, "embeddings")
    q = np.asarray(
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding").first()[0], dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cos = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "label": pdf["label"].astype("int32"),
                "cosine": np.round(cos, 6),
            })

    scored = (e.where(F.col("vec_id") != QUERY_VEC_ID)
              .select("vec_id", "label", "embedding")
              .mapInPandas(score, _SCHEMA))
    return _topk_ranked(scored)
