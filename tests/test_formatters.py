"""Diagram sinks: structure assertions (golden-shape, not full goldens)."""

from __future__ import annotations

import pytest

from gcp_datalake_utils_spark.formatters import (
    drawio_erd,
    mermaid_erd,
    plantuml_erd,
)
from gcp_datalake_utils_spark.operators.classify import classified_columns
from gcp_datalake_utils_spark.operators.detection import detect_all


@pytest.fixture(scope="module")
def ctx(spark):
    cls = classified_columns(spark).cache()
    rels = detect_all(spark).cache()
    return cls, rels


def test_mermaid_structure(spark, ctx):
    cls, rels = ctx
    doc = mermaid_erd(spark, cls, rels)
    lines = doc.split("\n")
    assert lines[0] == "erDiagram"
    assert "    customer {" in lines
    assert any("int64 c_custkey NOT NULL" in ln for ln in lines)
    n_rel_lines = sum(1 for ln in lines if "--" in ln and " : " in ln)
    assert n_rel_lines == rels.count()


def test_plantuml_structure(spark, ctx):
    cls, rels = ctx
    doc = plantuml_erd(spark, cls, rels)
    assert doc.startswith("@startuml ERD")
    assert doc.rstrip().endswith("@enduml")
    assert 'entity "h_adam" as h_adam {' in doc
    # PK marker precedes NOT NULL, then name : type (reference order)
    assert "* NOT NULL id : INT64" in doc


def test_drawio_structure(spark, ctx):
    cls, rels = ctx
    import xml.etree.ElementTree as ET
    doc = drawio_erd(spark, cls, rels)
    root = ET.fromstring(doc)
    cells = root.findall(".//mxCell")
    tables = [c for c in cells if (c.get("id") or "").startswith("tbl_")]
    edges = [c for c in cells if (c.get("id") or "").startswith("rel_")]
    assert len(tables) == cls.select("table_id").distinct().count()
    assert len(edges) == rels.count()
