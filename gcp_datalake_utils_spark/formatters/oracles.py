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


def mermaid_lines_oracle(show_column_types: bool = True,
                         show_column_nullable: bool = True,
                         include_views: bool = True,
                         include_external: bool = True) -> str:
    type_tok = "lower(data_type)" if show_column_types else "'string'"
    nn = ("CASE WHEN mode = 'REQUIRED' THEN ' NOT NULL' ELSE '' END"
          if show_column_nullable else "''")
    return do._preamble(include_views, include_external) + f"""
, mlines AS (
  SELECT 0 AS k1, 0 AS k2, 0 AS k3, 'erDiagram' AS line
  UNION ALL
  SELECT 1, table_ord, 0, '    ' || table_id || ' {{' FROM tabs
  UNION ALL
  SELECT 1, table_ord, ordinal,
         '        ' || {type_tok} || ' ' || name
         || CASE WHEN is_pk THEN ' PK' ELSE '' END
         || CASE WHEN is_fk THEN ' FK' ELSE '' END
         || {nn}
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


def drawio_lines_oracle(grid_cols: int = 4, cell_w: int = 200,
                        cell_h: int = 40, gap_x: int = 60,
                        gap_y: int = 60,
                        theme: str = "default") -> str:
    from gcp_datalake_utils_spark.formatters.diagrams import (
        DRAWIO_THEME_STYLES)
    theme_style = DRAWIO_THEME_STYLES[theme]
    esc = ("replace(replace(replace(replace({0}, '&', '&amp;'), "
           "'<', '&lt;'), '>', '&gt;'), '\"', '&quot;')")
    tid = esc.format("table_id")
    return do._preamble() + f"""
, tcounts AS (
  SELECT t.table_id, t.table_ord, c.n_cols
  FROM tabs t JOIN (SELECT table_ord, count(*) AS n_cols
                    FROM cls GROUP BY table_ord) c USING (table_ord)
), dlines AS (
  SELECT 0 AS k1, 0 AS k2, 0 AS k3,
         '<?xml version="1.0" encoding="UTF-8"?>' AS line
  UNION ALL SELECT 0, 1, 0, '<mxfile host="app.diagrams.net">'
  UNION ALL SELECT 0, 2, 0, '  <diagram id="erd" name="ERD">'
  UNION ALL SELECT 0, 3, 0, '    <mxGraphModel><root>'
  UNION ALL SELECT 0, 4, 0, '      <mxCell id="0"/>'
  UNION ALL SELECT 0, 5, 0, '      <mxCell id="1" parent="0"/>'
  UNION ALL
  SELECT 1, table_ord, 0,
         '      <mxCell id="tbl_' || {tid} || '" value="' || {tid}
         || '" vertex="1" parent="1" '
         || 'style="shape=table;startSize=30;{theme_style}">'
         || '<mxGeometry x="'
         || CAST(((table_ord - 1) % {grid_cols})
                 * {cell_w + gap_x} AS BIGINT)
         || '" y="'
         || CAST(floor((table_ord - 1) / {grid_cols})
                 * {cell_h * 6 + gap_y} AS BIGINT)
         || '" width="{cell_w}" height="'
         || CAST({cell_h} * (1 + n_cols) AS BIGINT)
         || '" as="geometry"/></mxCell>'
  FROM tcounts
  UNION ALL
  SELECT 2,
         CAST(row_number() OVER (ORDER BY source_table, source_column,
              target_table, target_column) AS INTEGER), 0,
         '      <mxCell id="rel_'
         || CAST(row_number() OVER (ORDER BY source_table,
                source_column, target_table, target_column) - 1
                AS BIGINT)
         || '" edge="1" parent="1" source="tbl_'
         || {esc.format('source_table')} || '" target="tbl_'
         || {esc.format('target_table')} || '" style="'
         || CASE WHEN confidence >= 0.8 THEN 'endArrow=block'
                 ELSE 'endArrow=open;dashed=1' END
         || '"><mxGeometry relative="1" as="geometry"/></mxCell>'
  FROM validated
  UNION ALL SELECT 3, 0, 0, '    </root></mxGraphModel>'
  UNION ALL SELECT 3, 1, 0, '  </diagram>'
  UNION ALL SELECT 3, 2, 0, '</mxfile>'
)
SELECT CAST(row_number() OVER (ORDER BY k1, k2, k3) AS INTEGER)
         AS line_no, line
FROM dlines
"""


def plantuml_lines_oracle(show_column_types: bool = True,
                          show_column_nullable: bool = True,
                          include_views: bool = True,
                          include_external: bool = True) -> str:
    ent = "lower(translate({0}, '- ', '__'))"
    type_sfx = "' : ' || data_type" if show_column_types else "''"
    nn = ("CASE WHEN mode = 'REQUIRED' THEN 'NOT NULL ' ELSE '' END"
          if show_column_nullable else "''")
    return do._preamble(include_views, include_external) + f"""
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
         || {nn}
         || name || {type_sfx}
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
