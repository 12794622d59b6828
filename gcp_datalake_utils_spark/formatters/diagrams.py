"""ERD diagram sinks: Mermaid / PlantUML / Draw.io (SURVEY.md §2.7 F12).

The reference renders diagrams by looping pydantic objects into strings
(``formatters/`` in /root/reference/bigquery-to-erd). Here line
generation is itself a DataFrame computation — (sort-key, line) rows
built from the catalog + relationships and numbered with a global
``row_number`` — so the diagram body is oracle-checkable like any other
query; only the final newline-join collects (diagram-scale by
definition: SURVEY.md §2.1 S12).

Line grammar mirrors ``mermaid_formatter.py`` / ``plantuml_formatter.py``
(type-lowered column lines, PK/FK/NOT NULL markers, ``}o--||``-style
connectors); table order is ``table_ord``, relationship order is the
engine's canonical (source_table, source_column, target_table,
target_column) — replacing the reference's list order (FIXTURES.md §4).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.catalog import fixtures as fx
from gcp_datalake_utils_spark.operators.classify import classified_columns
from gcp_datalake_utils_spark.operators.detection import detect_all

_CONNECTOR = (
    "CASE relationship_type "
    "WHEN 'one_to_one' THEN '||--||' "
    "WHEN 'one_to_many' THEN '||--o{' "
    "WHEN 'many_to_one' THEN '}o--||' "
    "WHEN 'many_to_many' THEN '}o--o{' "
    "ELSE '||--o{' END")


def _numbered(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.orderBy("k1", "k2", "k3")
    return (out.withColumn("line_no", F.row_number().over(w))
            .select("line_no", "line"))


def mermaid_lines(spark: SparkSession,
                  cls: DataFrame | None = None,
                  rels: DataFrame | None = None) -> DataFrame:
    """[Q] (line_no, line) rows of the Mermaid ERD."""
    cls = cls if cls is not None else classified_columns(spark)
    rels = rels if rels is not None else detect_all(spark)
    header = spark.range(1).select(
        F.lit(0).alias("k1"), F.lit(0).alias("k2"), F.lit(0).alias("k3"),
        F.lit("erDiagram").alias("line"))
    t_open = cls.select("table_ord").distinct().join(
        F.broadcast(fx.meta_tables_df(spark)), "table_ord").select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.lit(0).alias("k3"),
        F.concat(F.lit("    "), "table_id", F.lit(" {")).alias("line"))
    col_lines = cls.select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.col("ordinal").alias("k3"),
        F.concat(
            F.lit("        "), F.lower("data_type"), F.lit(" "), "name",
            F.when(F.col("is_pk"), " PK").otherwise(""),
            F.when(F.col("is_fk"), " FK").otherwise(""),
            F.when(F.col("mode") == "REQUIRED", " NOT NULL").otherwise(""))
        .alias("line"))
    t_close = cls.select("table_ord").distinct().select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.lit(9998).alias("k3"), F.lit("    }").alias("line"))
    t_blank = cls.select("table_ord").distinct().select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.lit(9999).alias("k3"), F.lit("").alias("line"))
    w = Window.orderBy("source_table", "source_column", "target_table",
                       "target_column")
    rel_lines = rels.withColumn("rk", F.row_number().over(w)).select(
        F.lit(2).alias("k1"), F.col("rk").alias("k2"), F.lit(0).alias("k3"),
        F.concat(F.lit("    "), "source_table", F.lit(" "),
                 F.expr(_CONNECTOR), F.lit(" "), "target_table",
                 F.lit(" : "), "source_column", F.lit(" -> "),
                 "target_column").alias("line"))
    return _numbered([header, t_open, col_lines, t_close, t_blank,
                      rel_lines])


def mermaid_erd(spark: SparkSession,
                cls: DataFrame | None = None,
                rels: DataFrame | None = None) -> str:
    """Driver-facing sink: the full Mermaid document."""
    rows = mermaid_lines(spark, cls, rels).orderBy("line_no").collect()
    return "\n".join(r["line"] for r in rows)


def plantuml_lines(spark: SparkSession,
                   cls: DataFrame | None = None,
                   rels: DataFrame | None = None) -> DataFrame:
    """[Q] (line_no, line) rows of the PlantUML ERD (entity names
    sanitized per ``plantuml_formatter.py:48-58``: -/space -> _,
    lowercased)."""
    cls = cls if cls is not None else classified_columns(spark)
    rels = rels if rels is not None else detect_all(spark)
    ent = F.lower(F.translate(F.col("table_id"), "- ", "__"))
    header = spark.range(1).select(
        F.lit(0).alias("k1"), F.lit(0).alias("k2"), F.lit(0).alias("k3"),
        F.lit("@startuml ERD").alias("line"))
    theme = spark.range(1).select(
        F.lit(0).alias("k1"), F.lit(1).alias("k2"), F.lit(0).alias("k3"),
        F.lit("!theme plain").alias("line"))
    blank0 = spark.range(1).select(
        F.lit(0).alias("k1"), F.lit(2).alias("k2"), F.lit(0).alias("k3"),
        F.lit("").alias("line"))
    t_open = cls.select("table_ord").distinct().join(
        F.broadcast(fx.meta_tables_df(spark)), "table_ord").select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.lit(0).alias("k3"),
        F.concat(F.lit('entity "'), "table_id", F.lit('" as '), ent,
                 F.lit(" {")).alias("line"))
    col_lines = cls.select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.col("ordinal").alias("k3"),
        F.concat(
            F.lit("    "),
            F.when(F.col("is_pk"), "* ").otherwise(""),
            F.when(F.col("is_fk"), "~ ").otherwise(""),
            F.when(F.col("mode") == "REQUIRED", "NOT NULL ").otherwise(""),
            F.col("name"), F.lit(" : "), "data_type").alias("line"))
    t_close = cls.select("table_ord").distinct().select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.lit(9998).alias("k3"), F.lit("}").alias("line"))
    t_blank = cls.select("table_ord").distinct().select(
        F.lit(1).alias("k1"), F.col("table_ord").alias("k2"),
        F.lit(9999).alias("k3"), F.lit("").alias("line"))
    sent = F.lower(F.translate(F.col("source_table"), "- ", "__"))
    tent = F.lower(F.translate(F.col("target_table"), "- ", "__"))
    w = Window.orderBy("source_table", "source_column", "target_table",
                       "target_column")
    rel_lines = rels.withColumn("rk", F.row_number().over(w)).select(
        F.lit(2).alias("k1"), F.col("rk").alias("k2"), F.lit(0).alias("k3"),
        F.concat(sent, F.lit(" "), F.expr(_CONNECTOR), F.lit(" "), tent,
                 F.lit(" : "), "source_column", F.lit(" -> "),
                 "target_column").alias("line"))
    footer = spark.range(1).select(
        F.lit(3).alias("k1"), F.lit(0).alias("k2"), F.lit(0).alias("k3"),
        F.lit("@enduml").alias("line"))
    return _numbered([header, theme, blank0, t_open, col_lines, t_close,
                      t_blank, rel_lines, footer])


def plantuml_erd(spark: SparkSession,
                 cls: DataFrame | None = None,
                 rels: DataFrame | None = None) -> str:
    rows = plantuml_lines(spark, cls, rels).orderBy("line_no").collect()
    return "\n".join(r["line"] for r in rows)


def drawio_erd(spark: SparkSession,
               cls: DataFrame | None = None,
               rels: DataFrame | None = None,
               grid_cols: int = 4,
               cell_w: int = 200, cell_h: int = 40,
               gap_x: int = 60, gap_y: int = 60) -> str:
    """Draw.io XML sink (``drawio_formatter.py`` shape): entity boxes on
    a deterministic grid (G5 layout: position by table_ord), one edge per
    relationship. Layout arithmetic runs as Column expressions; only the
    final (diagram-scale) rows collect for XML assembly."""
    cls = cls if cls is not None else classified_columns(spark)
    rels = rels if rels is not None else detect_all(spark)
    counts = (cls.groupBy("table_id", "table_ord")
              .agg(F.count("*").alias("n_cols"))
              .withColumn("idx", F.col("table_ord") - 1)
              .withColumn("grid_x",
                          (F.col("idx") % grid_cols) * (cell_w + gap_x))
              .withColumn("grid_y",
                          F.floor(F.col("idx") / grid_cols)
                          * (cell_h * 6 + gap_y)))
    tables = counts.orderBy("table_ord").collect()
    rel_rows = rels.orderBy("source_table", "source_column",
                            "target_table", "target_column").collect()
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<mxfile host="app.diagrams.net">',
             '  <diagram id="erd" name="ERD">',
             '    <mxGraphModel><root>',
             '      <mxCell id="0"/>',
             '      <mxCell id="1" parent="0"/>']
    for t in tables:
        h = cell_h * (1 + t["n_cols"])
        parts.append(
            f'      <mxCell id="tbl_{escape(t["table_id"])}" '
            f'value="{escape(t["table_id"])}" vertex="1" parent="1" '
            f'style="shape=table;startSize=30;">'
            f'<mxGeometry x="{t["grid_x"]}" y="{t["grid_y"]}" '
            f'width="{cell_w}" height="{h}" as="geometry"/></mxCell>')
    for i, r in enumerate(rel_rows):
        style = "endArrow=block" if r["confidence"] >= 0.8 \
            else "endArrow=open;dashed=1"
        parts.append(
            f'      <mxCell id="rel_{i}" edge="1" parent="1" '
            f'source="tbl_{escape(r["source_table"])}" '
            f'target="tbl_{escape(r["target_table"])}" '
            f'style="{style}"><mxGeometry relative="1" as="geometry"/>'
            f'</mxCell>')
    parts += ['    </root></mxGraphModel>', '  </diagram>', '</mxfile>']
    return "\n".join(parts)
