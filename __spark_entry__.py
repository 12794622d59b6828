"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL. The
engine lives in ``gcp_datalake_utils_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_datalake_utils_spark import queries_registry as qr


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full relationship-detection pipeline over the metadata
    catalog + TPC-H payload custom rules (smoke on sf0.001)."""
    return qr.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return qr.QUERIES


def oracle_sql() -> dict[str, str]:
    return qr.ORACLES
