from gcp_datalake_utils_spark.catalog.fixtures import (  # noqa: F401
    CUSTOM_RULES,
    META_COLUMNS,
    META_TABLES,
    NAMING_PATTERNS,
    custom_rules_df,
    custom_rules_values,
    meta_columns_df,
    meta_columns_values,
    meta_tables_df,
    meta_tables_values,
    naming_patterns_df,
    naming_patterns_values,
)
