"""gcp_datalake_utils_spark — a PySpark-native analytics engine.

Brand-new engine providing, Spark-natively, the query and data-processing
capabilities of the reference `UriBer/gcp-datalake-utils` (BigQuery ERD
relationship detection + dataset restore), re-expressed as lazy DataFrame
transforms so every operator scales horizontally:

- catalog/: schema-as-data (tables/columns metadata DataFrames)
- rules/: declarative pattern-config -> Column-expression compiler
- operators/: detection joins, data-testing, dedup/top-N, graph, state
- functions/: scalar expression batteries shared across operators
- formatters/: Mermaid / PlantUML / Draw.io ERD sinks
- llm/: large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns)
- streaming/: Structured Streaming surface over event tables
- sources/: parquet/json table registry + snapshot (time-travel) reader

Design rules (enforced throughout):
- DataFrame/SQL first; no driver-side loops over data, no RDDs.
- Broadcast the (tiny) metadata side of every join.
- Deterministic total-order tie-breaks on every top-k/dedup operator so
  results hash-match a DuckDB oracle (FIXTURES.md §4).
- Floats rounded to 6 places at output boundaries.
"""

__version__ = "0.1.0"
