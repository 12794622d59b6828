"""Central registry mapping SURVEY.md §2 operators to (query, oracle) pairs.

Each entry: name -> callable(spark, sf_dir) -> DataFrame, plus a DuckDB
oracle SQL string in ORACLES. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_datalake_utils_spark.operators import classify

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame],
             oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


register("classify_pk_fk", classify.classification_query,
         classify.classification_oracle())
register("schema_complexity", classify.schema_complexity_query,
         classify.schema_complexity_oracle())


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify.classification_query(spark, sf_dir)
