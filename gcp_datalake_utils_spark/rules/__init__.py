from gcp_datalake_utils_spark.rules.config import (  # noqa: F401
    DEFAULT,
    PatternConfig,
)
from gcp_datalake_utils_spark.rules.compiler import (  # noqa: F401
    best_pk_order_sql,
    fk_sql,
    likely_pk_sql,
    common_pk_sql,
    pk_sql,
    strip_key_suffix_sql,
    type_compat_group_sql,
)
