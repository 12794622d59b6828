"""Central registry mapping SURVEY.md §2 operators to (query, oracle) pairs.

Each entry: name -> callable(spark, sf_dir) -> DataFrame, plus a DuckDB
oracle SQL string in ORACLES. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from gcp_datalake_utils_spark.operators import classify, detection
from gcp_datalake_utils_spark.operators import detection_oracle as do

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


register("detect_foreign_key",
         lambda s, d: detection.detect_foreign_keys(s),
         do.strategy_oracle("j1"))
register("detect_naming_convention",
         lambda s, d: detection.detect_naming_conventions(s),
         do.strategy_oracle("j4"))
register("detect_enhanced_pk_fk",
         lambda s, d: detection.detect_enhanced_pk_fk(s),
         do.strategy_oracle("j2"))
register("detect_data_type_match",
         lambda s, d: detection.detect_data_type_matches(s),
         do.strategy_oracle("j3"))
register("detect_custom_rules",
         lambda s, d: detection.apply_custom_rules(s),
         do.strategy_oracle("j5"))
register("detect_pipeline",
         lambda s, d: detection.detect_all(s),
         do.pipeline_oracle())


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detection.detect_all(spark)
