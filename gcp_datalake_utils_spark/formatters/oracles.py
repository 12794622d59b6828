"""DuckDB oracles for the diagram line-generator queries."""

from __future__ import annotations

from gcp_datalake_utils_spark.operators import detection_oracle as do

_CONNECTOR = (
    "CASE relationship_type "
    "WHEN 'one_to_one' THEN '||--||' "
    "WHEN 'one_to_many' THEN '||--o{' "
    "WHEN 'many_to_one' THEN '}o--||' "
    "WHEN 'many_to_many' THEN '}o--o{' "
    "ELSE '||--o{' END")


def mermaid_lines_oracle() -> str:
    return do._preamble() + f"""
, mlines AS (
  SELECT 0 AS k1, 0 AS k2, 0 AS k3, 'erDiagram' AS line
  UNION ALL
  SELECT 1, table_ord, 0, '    ' || table_id || ' {{' FROM tabs
  UNION ALL
  SELECT 1, table_ord, ordinal,
         '        ' || lower(data_type) || ' ' || name
         || CASE WHEN is_pk THEN ' PK' ELSE '' END
         || CASE WHEN is_fk THEN ' FK' ELSE '' END
         || CASE WHEN mode = 'REQUIRED' THEN ' NOT NULL' ELSE '' END
  FROM cls
  UNION ALL
  SELECT 1, table_ord, 9998, '    }}' FROM tabs
  UNION ALL
  SELECT 1, table_ord, 9999, '' FROM tabs
  UNION ALL
  SELECT 2,
         CAST(row_number() OVER (ORDER BY source_table, source_column,
              target_table, target_column) AS INTEGER), 0,
         '    ' || source_table || ' ' || {_CONNECTOR} || ' '
         || target_table || ' : ' || source_column || ' -> '
         || target_column
  FROM validated
)
SELECT CAST(row_number() OVER (ORDER BY k1, k2, k3) AS INTEGER)
         AS line_no, line
FROM mlines
"""


def plantuml_lines_oracle() -> str:
    ent = "lower(translate({0}, '- ', '__'))"
    return do._preamble() + f"""
, plines AS (
  SELECT 0 AS k1, 0 AS k2, 0 AS k3, '@startuml ERD' AS line
  UNION ALL SELECT 0, 1, 0, '!theme plain'
  UNION ALL SELECT 0, 2, 0, ''
  UNION ALL
  SELECT 1, table_ord, 0,
         'entity "' || table_id || '" as ' || {ent.format('table_id')}
         || ' {{'
  FROM tabs
  UNION ALL
  SELECT 1, table_ord, ordinal,
         '    ' || CASE WHEN is_pk THEN '* ' ELSE '' END
         || CASE WHEN is_fk THEN '~ ' ELSE '' END
         || CASE WHEN mode = 'REQUIRED' THEN 'NOT NULL ' ELSE '' END
         || name || ' : ' || data_type
  FROM cls
  UNION ALL
  SELECT 1, table_ord, 9998, '}}' FROM tabs
  UNION ALL
  SELECT 1, table_ord, 9999, '' FROM tabs
  UNION ALL
  SELECT 2,
         CAST(row_number() OVER (ORDER BY source_table, source_column,
              target_table, target_column) AS INTEGER), 0,
         {ent.format('source_table')} || ' ' || {_CONNECTOR} || ' '
         || {ent.format('target_table')} || ' : ' || source_column
         || ' -> ' || target_column
  FROM validated
  UNION ALL SELECT 3, 0, 0, '@enduml'
)
SELECT CAST(row_number() OVER (ORDER BY k1, k2, k3) AS INTEGER)
         AS line_no, line
FROM plines
"""
