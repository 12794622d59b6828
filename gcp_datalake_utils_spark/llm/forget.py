"""Delete-propagation manifest (right-to-be-forgotten cascade,
north-star extension).

A takedown/GDPR request names documents; every DERIVED table keyed by
the same identity (embedding stores, chunk indexes, feature caches)
must purge its rows too. The operator materializes the cascade as a
single manifest — (table_name, row_id) for every row a downstream
writer must delete — which is the artifact production pipelines feed
to per-table DELETE jobs (or Delta/Iceberg ``MERGE ... WHEN MATCHED
THEN DELETE``).

The demo deletion set is the deterministic slice doc_id % 97 == 3 (a
takedown list is external input; a modulus keeps the oracle
dual-dialect). The fixture convention maps ``embeddings.vec_id`` to
``documents.doc_id`` (same id space, one vector per document).

Spark-first shape, and why it holds at 100 TB:

1. the deletion set is takedown-sized (<< corpus) — each derived
   table purges via ONE broadcast LEFT SEMI join: every table is
   scanned exactly once, no table-side shuffle at all;
2. the scan is a narrow id projection (column pruning reaches the
   parquet scan — the manifest never reads document text or
   embedding vectors);
3. the manifest union is a zero-shuffle concatenation.

Reference parity: generalizes the reference's referential-integrity
semi/anti-join machinery (SURVEY §2 J6; gcp-datalake-utils
data_relationship_tester.py) from validation to governance; cited
there, not copied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

FORGET_MOD = 97
FORGET_REMAINDER = 3


def _deletion_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % FORGET_MOD == FORGET_REMAINDER)
            .select("doc_id"))


def forget_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] the cascade manifest: (table_name, row_id) for every row
    that must be deleted from documents and its derived tables."""
    del_ids = _deletion_set(spark, sf_dir)
    doc_rows = (load_table(spark, sf_dir, "documents")
                .join(F.broadcast(del_ids), "doc_id", "left_semi")
                .select(F.lit("documents").alias("table_name"),
                        F.col("doc_id").alias("row_id")))
    emb_rows = (load_table(spark, sf_dir, "embeddings")
                .join(F.broadcast(del_ids.select(
                    F.col("doc_id").alias("vec_id"))),
                    "vec_id", "left_semi")
                .select(F.lit("embeddings").alias("table_name"),
                        F.col("vec_id").alias("row_id")))
    return doc_rows.unionByName(emb_rows)


FORGET_PROPAGATION_ORACLE = f"""
WITH del AS (
  SELECT doc_id FROM documents
  WHERE doc_id % {FORGET_MOD} = {FORGET_REMAINDER}
)
SELECT 'documents' AS table_name, d.doc_id AS row_id
FROM documents d SEMI JOIN del ON d.doc_id = del.doc_id
UNION ALL
SELECT 'embeddings' AS table_name, e.vec_id AS row_id
FROM embeddings e SEMI JOIN del ON e.vec_id = del.doc_id
"""
