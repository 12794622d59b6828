from gcp_datalake_utils_spark.formatters.diagrams import (  # noqa: F401
    drawio_erd,
    mermaid_erd,
    mermaid_lines,
    plantuml_erd,
    plantuml_lines,
)
