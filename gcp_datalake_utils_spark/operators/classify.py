"""PK/FK classification over the metadata catalog (SURVEY.md §2.2 P3-P5).

The reference classifies per column in driver Python
(``schema_analyzer.py:42-90`` in /root/reference/bigquery-to-erd); here the
whole catalog is classified in one narrow projection — the compiled rule
expressions are plain Column expressions, so Catalyst folds them into a
single whole-stage-codegen projection over the (broadcastable) metadata
DataFrame. No shuffle is involved at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.catalog import fixtures as fx
from gcp_datalake_utils_spark.rules import compiler as rc


def classified_columns(spark: SparkSession,
                       columns_df: DataFrame | None = None,
                       tables_df: DataFrame | None = None,
                       config: "rc.PatternConfig | None" = None,
                       include_views: bool = True,
                       include_external: bool = True) -> DataFrame:
    """meta_columns enriched with classification flags + table order.

    Output columns: table_id, table_ord, ordinal, name, data_type, mode,
    is_pk, is_fk, likely_pk, common_pk, type_group.

    ``config`` takes a :class:`rules.config.PatternConfig` — e.g.
    ``PatternConfig.from_json(path)`` with a reference-format
    ``relationship_patterns.json`` — and defaults to the shipped rules.

    ``include_views`` / ``include_external`` mirror the reference
    connector's table-type gate (bigquery_connector.py:224,
    config.py:48-49): excluded tables never enter classification, so
    downstream detection/formatting behaves as if they don't exist.
    The engine-level default keeps every table (the established [Q]
    row semantics); the CLI applies the reference's false defaults.
    """
    from gcp_datalake_utils_spark.rules.config import DEFAULT
    cfg = config or DEFAULT
    cols = columns_df if columns_df is not None else fx.meta_columns_df(spark)
    tabs = tables_df if tables_df is not None else fx.meta_tables_df(spark)
    if not include_views:
        tabs = tabs.where(F.col("table_type") != "VIEW")
    if not include_external:
        tabs = tabs.where(F.col("table_type") != "EXTERNAL")
    d = "spark"
    enriched = (
        cols.join(F.broadcast(tabs.select("table_id", "table_ord")),
                  "table_id")
        .withColumn("is_pk", F.expr(rc.pk_sql(d, cfg)))
        .withColumn("is_fk", F.expr(rc.fk_sql(d, cfg)))
        .withColumn("likely_pk", F.expr(rc.likely_pk_sql(d, cfg)))
        .withColumn("common_pk", F.expr(rc.common_pk_sql(d)))
        .withColumn("type_group", F.expr(rc.type_compat_group_sql()))
    )
    return enriched


def classification_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] P3/P4/P5: classification flags for every catalog column, with
    the type parameters (max_length / precision / scale, models.py:41-43)
    carried through for downstream consumers."""
    return classified_columns(spark).select(
        "table_id", "ordinal", "name", "data_type", "mode",
        "max_length", "precision", "scale",
        "is_pk", "is_fk", "likely_pk")


def classification_oracle() -> str:
    d = "duck"
    return f"""
SELECT c.table_id, c.ordinal, c.name, c.data_type, c.mode,
       c.max_length, c.precision, c.scale,
       {rc.pk_sql(d)} AS is_pk,
       {rc.fk_sql(d)} AS is_fk,
       {rc.likely_pk_sql(d)} AS likely_pk
FROM {fx.meta_columns_values('c')}
JOIN {fx.meta_tables_values('t')} USING (table_id)
"""


def schema_complexity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] A7: per-table complexity metrics
    (``schema_analyzer.py:306-326``; the reference builds this dict and
    forgets to return it — fixed here per SURVEY.md §7.5)."""
    c = classified_columns(spark)
    t = fx.meta_tables_df(spark)
    agg = (
        c.groupBy("table_id")
        .agg(
            F.count("*").cast("long").alias("total_columns"),
            F.sum(F.when(F.col("is_pk"), 1).otherwise(0))
            .cast("long").alias("primary_keys"),
            F.sum(F.when(F.col("is_fk"), 1).otherwise(0))
            .cast("long").alias("foreign_keys"),
            F.sum(F.when(F.col("mode") == "NULLABLE", 1).otherwise(0))
            .cast("long").alias("nullable_columns"),
            F.sum(F.when(F.col("mode") == "REQUIRED", 1).otherwise(0))
            .cast("long").alias("required_columns"),
            F.sum(F.when(F.col("mode") == "REPEATED", 1).otherwise(0))
            .cast("long").alias("repeated_columns"),
            F.countDistinct("data_type").cast("long").alias("data_types"),
            F.sum(F.when(F.col("max_length").isNotNull()
                         | F.col("precision").isNotNull(), 1).otherwise(0))
            .cast("long").alias("parameterized_columns"),
        )
        .join(F.broadcast(t.select("table_id", "num_rows", "num_bytes",
                                   "labels_str")),
              "table_id")
        .select(
            "table_id", "total_columns", "primary_keys", "foreign_keys",
            "nullable_columns", "required_columns", "repeated_columns",
            "data_types", "parameterized_columns",
            F.when(F.col("labels_str") == "", F.lit(0))
            .otherwise(F.size(F.split("labels_str", ",")))
            .cast("long").alias("n_labels"),
            F.round(F.col("num_bytes") / (1024.0 * 1024.0), 6)
            .alias("table_size_mb"),
            F.col("num_rows").alias("row_count"))
    )
    return agg


def schema_complexity_oracle() -> str:
    d = "duck"
    return f"""
WITH cls AS (
  SELECT c.*, {rc.pk_sql(d)} AS is_pk, {rc.fk_sql(d)} AS is_fk
  FROM {fx.meta_columns_values('c')}
  JOIN {fx.meta_tables_values('t')} USING (table_id)
)
SELECT c.table_id,
       CAST(count(*) AS BIGINT) AS total_columns,
       CAST(sum(CASE WHEN is_pk THEN 1 ELSE 0 END) AS BIGINT)
         AS primary_keys,
       CAST(sum(CASE WHEN is_fk THEN 1 ELSE 0 END) AS BIGINT)
         AS foreign_keys,
       CAST(sum(CASE WHEN mode = 'NULLABLE' THEN 1 ELSE 0 END) AS BIGINT)
         AS nullable_columns,
       CAST(sum(CASE WHEN mode = 'REQUIRED' THEN 1 ELSE 0 END) AS BIGINT)
         AS required_columns,
       CAST(sum(CASE WHEN mode = 'REPEATED' THEN 1 ELSE 0 END) AS BIGINT)
         AS repeated_columns,
       CAST(count(DISTINCT data_type) AS BIGINT) AS data_types,
       CAST(sum(CASE WHEN max_length IS NOT NULL
                     OR precision IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS parameterized_columns,
       CAST(CASE WHEN any_value(t.labels_str) = '' THEN 0
            ELSE len(string_split(any_value(t.labels_str), ',')) END
            AS BIGINT) AS n_labels,
       round(any_value(t.num_bytes) / (1024.0 * 1024.0), 6)
         AS table_size_mb,
       any_value(t.num_rows) AS row_count
FROM cls c
JOIN {fx.meta_tables_values('t')} USING (table_id)
GROUP BY c.table_id
"""
