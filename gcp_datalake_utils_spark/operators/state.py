"""Incremental state + quality reporting (SURVEY.md §2.9 I1-I4, §2.4 A6).

The reference persists JSON state files and MD5 checksums per table
(``incremental_processor.py`` in /root/reference/bigquery-to-erd); the
engine expresses change detection as a hash-compare join against a state
table — at scale a Delta MERGE target, here a fixture DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.catalog import fixtures as fx
from gcp_datalake_utils_spark.operators import detection_oracle as do
from gcp_datalake_utils_spark.operators.detection import detect_all

STALE_AS_OF = "2024-06-02 12:00:00"  # fixed instant for the staleness gate
STALE_HOURS = 24


def table_checksums(spark: SparkSession) -> DataFrame:
    """I1 checksum (``get_table_checksum``, incremental_processor.py:79-100):
    md5 over table_id:dataset_id:sorted(name:type:mode) — one groupBy over
    the catalog, no payload access."""
    cols = fx.meta_columns_df(spark)
    tabs = fx.meta_tables_df(spark).select("table_id", "dataset_id")
    return (
        cols.withColumn(
            "descriptor", F.concat_ws(":", "name", "data_type", "mode"))
        .groupBy("table_id")
        .agg(F.array_join(F.sort_array(F.collect_list("descriptor")), "|")
             .alias("cols_str"))
        .join(F.broadcast(tabs), "table_id")
        .select("table_id",
                F.md5(F.concat_ws(":", "table_id", "dataset_id", "cols_str")
                      .cast("binary")).alias("checksum")))


def checksum_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] I1/I2: current checksums vs persisted state
    (``get_tables_to_process``, incremental_processor.py:116-136) —
    status per table: new / changed / unchanged."""
    cur = table_checksums(spark)
    state = fx.proc_state_df(spark).select(
        "table_id", F.col("checksum").alias("state_checksum"))
    return (cur.join(F.broadcast(state), "table_id", "left")
            .select(
                "table_id", "checksum",
                F.when(F.col("state_checksum").isNull(), "new")
                .when(F.col("state_checksum") != F.col("checksum"),
                      "changed")
                .otherwise("unchanged").alias("status")))


def checksum_gate_oracle() -> str:
    return f"""
WITH cur AS (
  SELECT c.table_id,
         md5(c.table_id || ':' || any_value(t.dataset_id) || ':' ||
             string_agg(c.name || ':' || c.data_type || ':' || c.mode,
                        '|' ORDER BY c.name || ':' || c.data_type || ':'
                        || c.mode)) AS checksum
  FROM {fx.meta_columns_values('c')}
  JOIN {fx.meta_tables_values('t')} USING (table_id)
  GROUP BY c.table_id
)
SELECT cur.table_id, cur.checksum,
       CASE WHEN s.checksum IS NULL THEN 'new'
            WHEN s.checksum <> cur.checksum THEN 'changed'
            ELSE 'unchanged' END AS status
FROM cur LEFT JOIN {fx.proc_state_values('s')} USING (table_id)
"""


def staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] I3/A9 (``is_stale``, incremental_processor.py:230-250): state
    entries older than 24h relative to a fixed as-of instant."""
    state = fx.proc_state_df(spark)
    return state.select(
        "table_id",
        F.date_format("last_processed", "yyyy-MM-dd HH:mm:ss")
        .alias("last_processed"),
        (F.col("last_processed")
         < F.to_timestamp(F.lit(STALE_AS_OF))
         - F.expr(f"INTERVAL {STALE_HOURS} HOURS")).alias("is_stale"))


def staleness_oracle() -> str:
    return f"""
SELECT table_id,
       strftime(last_processed, '%Y-%m-%d %H:%M:%S') AS last_processed,
       last_processed < TIMESTAMP '{STALE_AS_OF}'
                        - INTERVAL {STALE_HOURS} HOUR AS is_stale
FROM {fx.proc_state_values('s')}
"""


def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] A6 (``get_relationship_quality_report``,
    enhanced_relationship_detector.py:285-325): confidence buckets +
    average over the detection pipeline output, single row."""
    rels = detect_all(spark)
    return rels.agg(
        F.count("*").alias("total_relationships"),
        F.sum(F.when(F.col("confidence") >= 0.8, 1).otherwise(0))
        .cast("long").alias("high_confidence"),
        F.sum(F.when((F.col("confidence") >= 0.5)
                     & (F.col("confidence") < 0.8), 1).otherwise(0))
        .cast("long").alias("medium_confidence"),
        F.sum(F.when(F.col("confidence") < 0.5, 1).otherwise(0))
        .cast("long").alias("low_confidence"),
        F.round(F.avg("confidence"), 6).alias("average_confidence"))


def quality_report_oracle() -> str:
    return do._preamble() + """
SELECT count(*) AS total_relationships,
       CAST(sum(CASE WHEN confidence >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_confidence,
       CAST(sum(CASE WHEN confidence >= 0.5 AND confidence < 0.8
                THEN 1 ELSE 0 END) AS BIGINT) AS medium_confidence,
       CAST(sum(CASE WHEN confidence < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS low_confidence,
       round(avg(confidence), 6) AS average_confidence
FROM validated
"""


def state_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] I2: merged next-state — current checksums upserted into the
    persisted state (the Delta ``MERGE INTO`` shape as a full-outer
    join): changed/new tables get the as-of timestamp, unchanged keep
    theirs, dropped tables leave the state."""
    cur = table_checksums(spark)
    state = fx.proc_state_df(spark).select(
        "table_id", F.col("checksum").alias("old_checksum"),
        "last_processed")
    merged = cur.join(F.broadcast(state), "table_id", "left")
    return merged.select(
        "table_id", "checksum",
        F.date_format(
            F.when(F.col("old_checksum").isNull()
                   | (F.col("old_checksum") != F.col("checksum")),
                   F.to_timestamp(F.lit(STALE_AS_OF)))
            .otherwise(F.col("last_processed")),
            "yyyy-MM-dd HH:mm:ss").alias("last_processed"))


def state_upsert_oracle() -> str:
    return f"""
WITH cur AS (
  SELECT c.table_id,
         md5(c.table_id || ':' || any_value(t.dataset_id) || ':' ||
             string_agg(c.name || ':' || c.data_type || ':' || c.mode,
                        '|' ORDER BY c.name || ':' || c.data_type || ':'
                        || c.mode)) AS checksum
  FROM {fx.meta_columns_values('c')}
  JOIN {fx.meta_tables_values('t')} USING (table_id)
  GROUP BY c.table_id
)
SELECT cur.table_id, cur.checksum,
       strftime(CASE WHEN s.checksum IS NULL
                     OR s.checksum <> cur.checksum
                THEN TIMESTAMP '{STALE_AS_OF}'
                ELSE s.last_processed END,
                '%Y-%m-%d %H:%M:%S') AS last_processed
FROM cur LEFT JOIN {fx.proc_state_values('s')} USING (table_id)
"""


def cache_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] J9+I4: probe the relationship cache per detected
    relationship, keyed by the sorted table pair
    (``relationship_cache.py:30-34``); only entries within the 24h TTL
    (``:98-114``) count as hits."""
    rels = detect_all(spark)
    pair = F.concat_ws(
        "_", F.least("source_table", "target_table"),
        F.greatest("source_table", "target_table"))
    cache = fx.rel_cache_df(spark).select(
        "pair_key", F.col("confidence").alias("cached_confidence"),
        "cached_at")
    fresh = cache.where(
        F.col("cached_at") > F.to_timestamp(F.lit(fx.CACHE_AS_OF))
        - F.expr("INTERVAL 24 HOURS"))
    return (rels.withColumn("pair_key", pair)
            .join(F.broadcast(fresh), "pair_key", "left")
            .select("source_table", "source_column", "target_table",
                    "target_column",
                    F.col("cached_at").isNotNull().alias("cache_hit"),
                    F.round("cached_confidence", 6)
                    .alias("cached_confidence")))


def cache_lookup_oracle() -> str:
    return do._preamble() + f"""
, fresh AS (
  SELECT pair_key, confidence AS cached_confidence, cached_at
  FROM {fx.rel_cache_values('rc')}
  WHERE cached_at > TIMESTAMP '{fx.CACHE_AS_OF}' - INTERVAL 24 HOUR
)
SELECT v.source_table, v.source_column, v.target_table, v.target_column,
       f.cached_at IS NOT NULL AS cache_hit,
       round(f.cached_confidence, 6) AS cached_confidence
FROM validated v
LEFT JOIN fresh f
  ON f.pair_key = least(v.source_table, v.target_table) || '_'
                  || greatest(v.source_table, v.target_table)
"""


def relationships_per_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] A10: per-table relationship collection (the state-update
    grouping, ``enhanced_relationship_detector.py:98-101``) — the edge
    list gathered per participating table, serialized sorted so the
    result is order-free."""
    rels = detect_all(spark)
    edge = F.concat_ws("->",
                       F.concat_ws(".", "source_table", "source_column"),
                       F.concat_ws(".", "target_table", "target_column"))
    tall = (rels.select(F.col("source_table").alias("table_id"),
                        edge.alias("edge"))
            .unionByName(
                rels.select(F.col("target_table").alias("table_id"),
                            edge.alias("edge")))
            .distinct())
    return (tall.groupBy("table_id")
            .agg(F.count("*").alias("n_rels"),
                 F.array_join(F.sort_array(F.collect_list("edge")), ";")
                 .alias("rel_list")))


def relationships_per_table_oracle() -> str:
    return do._preamble() + """
, tall AS (
  SELECT DISTINCT table_id, edge FROM (
    SELECT source_table AS table_id,
           source_table || '.' || source_column || '->'
           || target_table || '.' || target_column AS edge
    FROM validated
    UNION ALL
    SELECT target_table,
           source_table || '.' || source_column || '->'
           || target_table || '.' || target_column
    FROM validated)
)
SELECT table_id, count(*) AS n_rels,
       string_agg(edge, ';' ORDER BY edge) AS rel_list
FROM tall GROUP BY table_id
"""


def save_state_json(state: DataFrame, path: str) -> None:
    """S10: persist incremental state as JSON (the reference's
    ``save_state``/``relationship_state.json``; a Delta MERGE target on
    full clusters)."""
    state.write.mode("overwrite").json(path)


def load_state_json(spark: SparkSession, path: str) -> DataFrame:
    """S10: reload persisted state (``load_state``)."""
    return spark.read.json(path)


def quality_by_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] A6 grouping: relationship counts per detection method and
    type (the reference computes these as separate dict tallies — a
    natural GROUPING SETS candidate, kept as one grouped pair here)."""
    rels = detect_all(spark)
    return (rels.groupBy("detection_method", "relationship_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("confidence"), 6).alias("avg_confidence")))


def quality_by_method_oracle() -> str:
    return do._preamble() + """
SELECT detection_method, relationship_type, count(*) AS n,
       round(avg(confidence), 6) AS avg_confidence
FROM validated
GROUP BY detection_method, relationship_type
"""
