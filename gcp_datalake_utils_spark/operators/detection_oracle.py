"""DuckDB oracle SQL for the detection pipeline.

Generates CTE SQL expressing the SAME documented semantics as
``operators/detection.py`` (each stage cites the reference lines there).
Leaf classification predicates come from the shared dual-dialect compiler;
the join/window stages are written independently in SQL — the correctness
gate compares the two implementations value-by-value.
"""

from __future__ import annotations

from gcp_datalake_utils_spark.catalog import fixtures as fx
from gcp_datalake_utils_spark.operators.detection import (
    MAX_RELS_PER_TABLE,
    METHOD_PRIORITY,
    MIN_CONFIDENCE,
    PREFERRED_METHODS,
)
from gcp_datalake_utils_spark.rules import compiler as rc

D = "duck"
PFX = rc.TARGET_PREFIXES

REL_FIELDS = ("source_table, source_column, target_table, target_column, "
              "relationship_type, confidence, detection_method, is_custom")


def _type_filter(include_views: bool, include_external: bool,
                 col: str = "table_type") -> str:
    """SQL predicate for the reference's table-type gate; TRUE when
    nothing is excluded so default oracles keep their semantics."""
    excl = ([] if include_views else ["'VIEW'"]) + \
        ([] if include_external else ["'EXTERNAL'"])
    return f"{col} NOT IN ({', '.join(excl)})" if excl else "TRUE"


def _preamble(include_views: bool = True,
              include_external: bool = True) -> str:
    strip = rc.strip_key_suffix_sql("lower(name)", D)
    score = ("(CASE WHEN lower(name) IN ('id','key','pk') THEN 10 ELSE 0 END"
             " + CASE WHEN mode = 'REQUIRED' THEN 5 ELSE 0 END)")

    # J1 candidate branches: ordered patterns
    j1_branches = []
    for prio, (pat, plural) in enumerate(
            [("_id", True), ("_id", False), ("_key", True), ("_fk", True)],
            start=1):
        base = f"regexp_extract(lower(name), '^(.+){pat}$', 1)"
        cand = f"{base} || 's'" if plural else base
        j1_branches.append(
            f"SELECT table_id AS source_table, name AS source_column, "
            f"data_type, {prio} AS prio, "
            f"CASE WHEN {rc.rx('lower(name)', f'^(.+){pat}$', D)} "
            f"THEN {cand} END AS cand FROM cls WHERE is_fk")
    j1_cand = "\nUNION ALL\n".join(j1_branches)

    # J2 strategy-1 candidates: base, prefixed, hub
    s1_branches = [
        "SELECT source_table, source_column, data_type, mode, 1 AS prio, "
        "base AS cand FROM j2_src"]
    for i, p in enumerate(PFX):
        s1_branches.append(
            f"SELECT source_table, source_column, data_type, mode, "
            f"{i + 2} AS prio, '{p}' || base AS cand FROM j2_src")
    s1_branches.append(
        "SELECT source_table, source_column, data_type, mode, 9 AS prio, "
        "CASE WHEN is_hub THEN 'h_' || hub_base END AS cand FROM j2_src")
    j2s1_cand = "\nUNION ALL\n".join(s1_branches)

    # J2 strategy-2 candidates: 4 transforms × (bare + prefixes), hub last
    transforms = ["base", "base || 's'", "base || 'es'",
                  "regexp_replace(base, 's+$', '')"]
    s2_branches = []
    for ci, t in enumerate(transforms):
        s2_branches.append(
            f"SELECT source_table, source_column, data_type, mode, "
            f"{ci * 10} AS prio, {t} AS cand FROM j2_src")
        for pi, p in enumerate(PFX):
            s2_branches.append(
                f"SELECT source_table, source_column, data_type, mode, "
                f"{ci * 10 + pi + 1} AS prio, '{p}' || {t} AS cand "
                f"FROM j2_src")
    s2_branches.append(
        "SELECT source_table, source_column, data_type, mode, 99 AS prio, "
        "CASE WHEN is_hub THEN 'h_' || hub_base END AS cand FROM j2_src")
    j2s2_cand = "\nUNION ALL\n".join(s2_branches)

    # J5 naming-pattern branches
    j5n_branches = []
    for pat, suffix, conf in fx.NAMING_PATTERNS:
        j5n_branches.append(f"""
SELECT c.table_id AS source_table, c.name AS source_column, c.data_type,
       regexp_extract(lower(c.name), '{pat}', 1) || '{suffix}' AS cand,
       CAST({conf!r} AS DOUBLE) AS confidence
FROM cls c WHERE {rc.rx('lower(c.name)', pat, D)}""")
    j5n_cand = "\nUNION ALL\n".join(j5n_branches)

    return f"""
WITH cls AS (
  SELECT c.table_id, t.table_ord, c.ordinal, c.name, c.data_type, c.mode,
         {rc.pk_sql(D)} AS is_pk,
         {rc.fk_sql(D)} AS is_fk,
         {rc.likely_pk_sql(D)} AS likely_pk,
         {rc.common_pk_sql(D)} AS common_pk,
         {rc.type_compat_group_sql()} AS type_group
  FROM {fx.meta_columns_values('c')}
  JOIN {fx.meta_tables_values('t')} USING (table_id)
  WHERE {_type_filter(include_views, include_external, 't.table_type')}
),
tabs AS (SELECT table_id, table_ord FROM {fx.meta_tables_values('mt')}
         WHERE {_type_filter(include_views, include_external,
                             'mt.table_type')}),
pk_first AS (
  SELECT table_id AS t_table, name AS pk_name FROM cls WHERE is_pk
  QUALIFY row_number() OVER (PARTITION BY table_id ORDER BY ordinal) = 1
),
scored AS (
  SELECT table_id AS t_table, data_type AS t_type, name AS scored_name
  FROM cls
  QUALIFY row_number() OVER (PARTITION BY table_id, data_type
            ORDER BY {score} DESC, ordinal) = 1
),
j1_cand AS (
{j1_cand}
),
j1_hit AS (
  SELECT source_table, source_column, data_type, cand AS target_table
  FROM (SELECT j.*, row_number() OVER (PARTITION BY source_table,
          source_column ORDER BY prio) AS rn
        FROM j1_cand j JOIN tabs ON j.cand = tabs.table_id
        WHERE j.cand IS NOT NULL)
  WHERE rn = 1
),
j1 AS (
  SELECT source_table, source_column, target_table,
         coalesce(pk_name, scored_name) AS target_column,
         'many_to_one' AS relationship_type, CAST(0.8 AS DOUBLE) AS confidence,
         'foreign_key' AS detection_method, FALSE AS is_custom
  FROM j1_hit h
  LEFT JOIN pk_first p ON h.target_table = p.t_table
  LEFT JOIN scored s ON h.target_table = s.t_table
        AND h.data_type = s.t_type
  WHERE coalesce(pk_name, scored_name) IS NOT NULL
),
j4_hit AS (
  SELECT c.table_id AS source_table, c.name AS source_column, c.data_type,
         tabs.table_id AS target_table
  FROM cls c
  JOIN tabs ON regexp_extract(lower(c.name), '^(.+)_id$', 1) || 's'
        = tabs.table_id
  WHERE NOT c.is_fk AND {rc.rx('lower(c.name)', '^(.+)_id$', D)}
),
j4 AS (
  SELECT source_table, source_column, target_table,
         coalesce(pk_name, scored_name) AS target_column,
         'many_to_one' AS relationship_type, CAST(0.6 AS DOUBLE) AS confidence,
         'naming_convention' AS detection_method, FALSE AS is_custom
  FROM j4_hit h
  LEFT JOIN pk_first p ON h.target_table = p.t_table
  LEFT JOIN scored s ON h.target_table = s.t_table
        AND h.data_type = s.t_type
  WHERE coalesce(pk_name, scored_name) IS NOT NULL
),
anyl AS (
  SELECT table_id, bool_or(likely_pk) AS has_likely FROM cls
  GROUP BY table_id
),
pkcand AS (
  SELECT cls.* FROM cls JOIN anyl USING (table_id)
  WHERE (has_likely AND likely_pk) OR ((NOT has_likely) AND common_pk)
),
bestpk AS (
  SELECT table_id AS t_table, name AS bp_name, data_type AS bp_type,
         mode AS bp_mode
  FROM pkcand
  QUALIFY row_number() OVER (PARTITION BY table_id ORDER BY
            {rc.best_pk_order_sql()}) = 1
),
j2_src AS (
  SELECT table_id AS source_table, table_ord AS source_ord,
         name AS source_column, data_type, mode,
         {strip} AS base,
         ({rc.ends('lower(name)', '_hk', D)}
          OR {rc.ends('lower(name)', '_hash_key', D)}) AS is_hub,
         regexp_replace(lower(name), '_(hk|hash_key)$', '') AS hub_base
  FROM cls WHERE NOT is_fk
),
j2s1_cand AS (
{j2s1_cand}
),
j2s1 AS (
  SELECT h.source_table, h.source_column, h.target_table,
         b.bp_name AS target_column, 1 AS strategy
  FROM (SELECT c.*, c.cand AS target_table, row_number() OVER (
          PARTITION BY source_table, source_column ORDER BY prio) AS rn
        FROM j2s1_cand c JOIN tabs ON c.cand = tabs.table_id
        WHERE c.cand IS NOT NULL) h
  JOIN bestpk b ON h.target_table = b.t_table
  WHERE h.rn = 1 AND h.data_type = b.bp_type AND h.mode = b.bp_mode
),
j2s2_cand AS (
{j2s2_cand}
),
j2s2 AS (
  SELECT h.source_table, h.source_column, h.target_table,
         b.bp_name AS target_column, 2 AS strategy
  FROM (SELECT c.*, c.cand AS target_table, row_number() OVER (
          PARTITION BY source_table, source_column ORDER BY prio) AS rn
        FROM j2s2_cand c JOIN tabs ON c.cand = tabs.table_id
        WHERE c.cand IS NOT NULL) h
  JOIN bestpk b ON h.target_table = b.t_table
  WHERE h.rn = 1 AND h.data_type = b.bp_type AND h.mode = b.bp_mode
),
j2s3 AS (
  SELECT s.source_table, s.source_column, p.table_id AS target_table,
         p.name AS target_column, 3 AS strategy
  FROM j2_src s
  JOIN pkcand p ON s.data_type = p.data_type AND s.mode = p.mode
        AND s.source_table <> p.table_id
  QUALIFY row_number() OVER (PARTITION BY s.source_table, s.source_column
            ORDER BY p.table_ord, p.ordinal) = 1
),
j2 AS (
  SELECT source_table, source_column, target_table, target_column,
         'many_to_one' AS relationship_type, CAST(0.9 AS DOUBLE) AS confidence,
         'enhanced_pk_fk' AS detection_method, FALSE AS is_custom
  FROM (SELECT * FROM j2s1 UNION ALL SELECT * FROM j2s2
        UNION ALL SELECT * FROM j2s3)
  QUALIFY row_number() OVER (PARTITION BY source_table, source_column
            ORDER BY strategy) = 1
),
j3 AS (
  SELECT a.table_id AS source_table, a.name AS source_column,
         b.table_id AS target_table, b.name AS target_column,
         'many_to_one' AS relationship_type, CAST(0.4 AS DOUBLE) AS confidence,
         'data_type_match' AS detection_method, FALSE AS is_custom
  FROM (SELECT *, lower(name) AS lname FROM cls WHERE NOT is_pk) a
  JOIN (SELECT *, lower(name) AS lname FROM cls WHERE NOT is_pk) b
    ON a.data_type = b.data_type
   AND (a.table_ord < b.table_ord
        OR (a.table_ord = b.table_ord AND a.ordinal < b.ordinal))
  WHERE a.table_id <> b.table_id
    AND NOT (a.mode = 'NULLABLE' AND b.mode = 'NULLABLE')
    AND ((a.lname = b.lname AND ({rc.ends('a.lname', '_id', D)}
          OR {rc.ends('a.lname', '_key', D)}))
      OR (a.lname = 'id' AND {rc.ends('b.lname', '_id', D)})
      OR (b.lname = 'id' AND {rc.ends('a.lname', '_id', D)})
      OR (a.lname = 'key' AND {rc.ends('b.lname', '_key', D)})
      OR (b.lname = 'key' AND {rc.ends('a.lname', '_key', D)}))
),
j5e AS (
  SELECT r.source_table, r.source_column, r.target_table, r.target_column,
         r.relationship_type, r.confidence,
         'custom_rules' AS detection_method, TRUE AS is_custom
  FROM {fx.custom_rules_values('r')}
  JOIN cls sc ON r.source_table = sc.table_id
        AND r.source_column = sc.name
  JOIN cls tc ON r.target_table = tc.table_id
        AND r.target_column = tc.name
),
j5n_cand AS (
{j5n_cand}
),
j5n AS (
  SELECT source_table, source_column, h.cand AS target_table,
         coalesce(pk_name, scored_name) AS target_column,
         'many_to_one' AS relationship_type, h.confidence,
         'custom_naming_pattern' AS detection_method, FALSE AS is_custom
  FROM (SELECT c.* FROM j5n_cand c JOIN tabs ON c.cand = tabs.table_id) h
  LEFT JOIN pk_first p ON h.cand = p.t_table
  LEFT JOIN scored s ON h.cand = s.t_table AND h.data_type = s.t_type
  WHERE coalesce(pk_name, scored_name) IS NOT NULL
),
allrels AS (
  SELECT *, {METHOD_PRIORITY['foreign_key']} AS method_priority FROM j1
  UNION ALL
  SELECT *, {METHOD_PRIORITY['naming_convention']} FROM j4
  UNION ALL
  SELECT *, {METHOD_PRIORITY['enhanced_pk_fk']} FROM j2
  UNION ALL
  SELECT *, {METHOD_PRIORITY['data_type_match']} FROM j3
  UNION ALL
  SELECT *, {METHOD_PRIORITY['custom_rules']} FROM j5e
  UNION ALL
  SELECT *, {METHOD_PRIORITY['custom_naming_pattern']} FROM j5n
),
resolved AS (
  SELECT * FROM allrels
  QUALIFY row_number() OVER (PARTITION BY source_table, source_column,
            target_table, target_column
            ORDER BY confidence DESC, is_custom DESC, method_priority) = 1
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source_table
            ORDER BY confidence DESC, method_priority, source_column,
            target_table, target_column) AS rn
  FROM resolved
),
marked AS (
  SELECT *, (rn <= {MAX_RELS_PER_TABLE}
             AND confidence >= {MIN_CONFIDENCE}
             AND (detection_method IN
                  ({', '.join(repr(m) for m in PREFERRED_METHODS)})
                  OR confidence >= 0.5)) AS meaningful
  FROM ranked
),
counts AS (
  SELECT source_table,
         sum(CASE WHEN meaningful THEN 1 ELSE 0 END) AS n_meaningful
  FROM marked GROUP BY source_table
),
extras AS (
  SELECT {REL_FIELDS}, method_priority, rn, TRUE AS is_backfill
  FROM (SELECT m.*, c.n_meaningful, row_number() OVER (
          PARTITION BY m.source_table ORDER BY m.rn) AS rn_e
        FROM marked m JOIN counts c USING (source_table)
        WHERE NOT m.meaningful AND m.confidence >= {MIN_CONFIDENCE}
          AND c.n_meaningful < 2)
  WHERE rn_e <= 2 - n_meaningful
),
kept AS (
  SELECT {REL_FIELDS}, method_priority, rn, FALSE AS is_backfill
  FROM marked WHERE meaningful
  UNION ALL
  SELECT * FROM extras
),
filtered AS (
  SELECT {REL_FIELDS} FROM kept
  QUALIFY row_number() OVER (PARTITION BY source_table, target_table
            ORDER BY is_backfill, rn) = 1
),
validated AS MATERIALIZED (
  SELECT f.* FROM filtered f
  JOIN cls sc ON f.source_table = sc.table_id
        AND f.source_column = sc.name
  JOIN cls tc ON f.target_table = tc.table_id
        AND f.target_column = tc.name
  WHERE sc.type_group = tc.type_group
)
"""


def strategy_oracle(stage: str) -> str:
    """Oracle selecting one strategy stage (j1, j4, j2, j3, j5e+j5n)."""
    if stage == "j5":
        body = (f"SELECT {REL_FIELDS} FROM j5e "
                f"UNION ALL SELECT {REL_FIELDS} FROM j5n")
    else:
        body = f"SELECT {REL_FIELDS} FROM {stage}"
    return _preamble() + body


def pipeline_oracle() -> str:
    """Oracle for the full standard pipeline (detect_all)."""
    return _preamble() + f"""
SELECT source_table, source_column, target_table, target_column,
       relationship_type, round(confidence, 6) AS confidence,
       detection_method, is_custom
FROM validated
"""
