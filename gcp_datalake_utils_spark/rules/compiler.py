"""Declarative classification rules -> SQL boolean expressions, dual dialect.

The reference interprets its pattern config imperatively per column
(``pattern_config.py:187-263``, ``schema_analyzer.py:109-218,328-447`` in
/root/reference/bigquery-to-erd). This engine compiles the same rules ONCE
into a single Column expression, fully Catalyst-optimizable — no UDFs, no
per-row Python (SURVEY.md §4 "rule compiler").

Every builder emits the expression in two dialects from the same rule data:

- ``dialect='spark'`` -> consumed via ``F.expr(...)`` in the operators
- ``dialect='duck'``  -> interpolated into the DuckDB oracle SQL

so the engine and the correctness oracle share classification semantics by
construction. Expressions reference the ``meta_columns`` schema: columns
``table_id``, ``name``, ``data_type``, ``mode`` (names/tables are matched
case-insensitively via ``lower()`` exactly like the reference).

Semantics compiled here (see SURVEY.md §2.2 P3-P9):

- legacy regex PK/FK patterns + candidate guards
  (``schema_analyzer.py:27-40,163-218``)
- pattern-config global indicators + per-table-prefix patterns
  (``config/relationship_patterns.json:4-238``); a ``dim_`` table matches
  BOTH methodologies' dimension patterns, so their pattern lists union
- Data-Vault / traditional-DW prefix dispatch, an ``elif`` chain in the
  reference (``schema_analyzer.py:328-447``) -> CASE expression here
"""

from __future__ import annotations


def _fn(dialect: str, spark_name: str, duck_name: str, *args: str) -> str:
    name = spark_name if dialect == "spark" else duck_name
    return f"{name}({', '.join(args)})"


def rx(col: str, pattern: str, dialect: str) -> str:
    """Anchored regex match (reference uses ``re.match`` = match-at-start;
    all compiled patterns are explicitly ^...$-anchored for clarity)."""
    return _fn(dialect, "regexp_like", "regexp_matches", col, f"'{pattern}'")


def ends(col: str, suffix: str, dialect: str) -> str:
    return _fn(dialect, "endswith", "ends_with", col, f"'{suffix}'")


def starts(col: str, prefix: str, dialect: str) -> str:
    return _fn(dialect, "startswith", "starts_with", col, f"'{prefix}'")


def inset(col: str, names: list[str]) -> str:
    return f"{col} IN ({', '.join(repr(n) for n in names)})"


def any_of(*exprs: str) -> str:
    return "(" + " OR ".join(exprs) + ")"


def all_of(*exprs: str) -> str:
    return "(" + " AND ".join(exprs) + ")"


from gcp_datalake_utils_spark.rules.config import DEFAULT, PatternConfig

# normalized references (the reference lowercases names/tables before
# every comparison)
C = "lower(name)"
TBL = "lower(table_id)"


def pattern_pred(col: str, patterns: tuple[str, ...] | list[str],
                 d: str) -> str:
    """OR-combined predicate for a pattern list: exact names fold into
    one IN; ``*``-suffix/prefix wildcards become ends/starts; general
    wildcards become anchored regexes (``_matches_pattern``,
    pattern_config.py:321-336)."""
    exacts = [p for p in patterns if "*" not in p]
    parts: list[str] = []
    if exacts:
        parts.append(inset(col, exacts))
    for p in patterns:
        if "*" not in p:
            continue
        if p.startswith("*") and "*" not in p[1:]:
            parts.append(ends(col, p[1:], d))
        elif p.endswith("*") and "*" not in p[:-1]:
            parts.append(starts(col, p[:-1], d))
        else:
            parts.append(rx(col, "^" + p.replace("*", ".*") + "$", d))
    return any_of(*parts) if parts else "FALSE"

# key-candidate data types (schema_analyzer.py:185,214)
KEY_TYPES = "upper(data_type) IN ('INTEGER', 'INT64', 'STRING', 'BYTES')"

LEGACY_PK_RX = "^(id|.*_id|.*_key|.*_pk|pk_.*)$"
LEGACY_FK_RX = "^(.*_id|.*_fk|.*_key|fk_.*)$"
# enhanced "likely primary key" patterns (relationship_detector.py:188-196)
LIKELY_PK_RX = "^(id|.*_id|.*_key|.*_pk|pk_.*|.*_code|.*_number)$"
COMMON_PK_NAMES = ["id", "key", "pk", "code", "number", "identifier"]

# name-suffix strip used by target resolution
# (relationship_detector.py:271)
KEY_SUFFIX_RX = "_(id|key|fk|pk|hk|hash_key)$"

TARGET_PREFIXES = ["h_", "dim_", "l_", "ref_", "fact_", "tbl_", "table_"]


def _config_pk(d: str, cfg: PatternConfig) -> str:
    """Pattern-config PK candidacy (pattern_config.py:187-213)."""
    by_prefix = [
        (starts(TBL, prefix, d), pattern_pred(C, pats["pk"], d))
        for prefix, pats in cfg.table_patterns.items() if pats["pk"]]
    parts = [pattern_pred(C, cfg.pk_indicators, d)]
    if by_prefix:
        parts.append("(" + " OR ".join(
            all_of(cond, body) for cond, body in by_prefix) + ")")
    return any_of(*parts)


def _config_fk(d: str, cfg: PatternConfig) -> str:
    """Pattern-config FK candidacy (pattern_config.py:215-241)."""
    by_prefix = [
        (starts(TBL, prefix, d), pattern_pred(C, pats["fk"], d))
        for prefix, pats in cfg.table_patterns.items() if pats["fk"]]
    parts = [pattern_pred(C, cfg.fk_indicators, d)]
    if by_prefix:
        parts.append("(" + " OR ".join(
            all_of(cond, body) for cond, body in by_prefix) + ")")
    return any_of(*parts)


def _dw_pk(d: str) -> str:
    """Data-warehouse PK elif chain (schema_analyzer.py:328-399) as CASE."""
    return (
        "(CASE "
        f"WHEN {starts(TBL, 'h_', d)} THEN "
        + any_of(
            inset(C, ["id", "key", "business_key", "bk"]),
            inset(C, ["hash_key", "hk", "hub_key"]),
            all_of(f"NOT {ends(C, '_id', d)}", f"NOT {ends(C, '_key', d)}"))
        + f" WHEN {starts(TBL, 'dim_', d)} THEN "
        + any_of(
            inset(C, ["id", "key", "sk", "surrogate_key", "dim_key", "dk"]),
            all_of(ends(C, "_id", d), f"NOT {ends(C, '_fk', d)}"),
            inset(C, ["hash_key", "hk", "dim_hash_key"]))
        + f" WHEN {starts(TBL, 'l_', d)} THEN "
        + any_of(
            inset(C, ["id", "key", "link_key", "lk"]),
            inset(C, ["hash_key", "hk", "link_hash_key"]),
            ends(C, "_hk", d), ends(C, "_hash_key", d))
        + f" WHEN {starts(TBL, 'ref_', d)} THEN "
        + any_of(
            inset(C, ["id", "key", "ref_key", "rk"]),
            ends(C, "_code", d), ends(C, "_id", d))
        + f" WHEN {starts(TBL, 'fact_', d)} THEN "
        + all_of(ends(C, "_id", d), f"NOT {ends(C, '_fk', d)}")
        + f" WHEN {starts(TBL, 'bridge_', d)} THEN "
        + inset(C, ["id", "key", "relationship_id"])
        + " ELSE FALSE END)"
    )


def _dv_fk(d: str) -> str:
    """Data-Vault FK elif chain (schema_analyzer.py:401-447) as CASE."""
    return (
        "(CASE "
        f"WHEN {starts(TBL, 'l_', d)} THEN "
        + any_of(ends(C, "_hk", d), ends(C, "_hash_key", d),
                 inset(C, ["hub_key", "hk"]))
        + f" WHEN {starts(TBL, 'dim_', d)} THEN "
        + any_of(ends(C, "_hk", d), ends(C, "_hash_key", d),
                 all_of(ends(C, "_id", d), f"NOT {ends(C, '_fk', d)}"))
        + f" WHEN {starts(TBL, 'h_', d)} THEN "
        + all_of(ends(C, "_id", d), f"NOT {ends(C, '_fk', d)}")
        + f" WHEN {starts(TBL, 'ref_', d)} THEN FALSE"
        + f" WHEN {starts(TBL, 'fact_', d)} THEN "
        + all_of(ends(C, "_id", d), f"NOT {ends(C, '_fk', d)}")
        + " ELSE FALSE END)"
    )


def pk_sql(dialect: str, cfg: PatternConfig = DEFAULT) -> str:
    """is_primary_key (schema_analyzer.py:109-134): config patterns OR
    (legacy regex AND candidate guards) OR DW prefix rules."""
    legacy = all_of(
        rx(C, LEGACY_PK_RX, dialect),
        "mode <> 'REPEATED'",
        f"NOT (mode = 'NULLABLE' AND {C} <> 'id')",
        KEY_TYPES)
    return any_of(_config_pk(dialect, cfg), legacy, _dw_pk(dialect))


def fk_sql(dialect: str, cfg: PatternConfig = DEFAULT) -> str:
    """is_foreign_key (schema_analyzer.py:136-161): config patterns OR
    (legacy regex AND not-PK AND candidate guards) OR DV prefix rules.
    Note the reference's config path does NOT exclude PKs — only the
    legacy fallback does (schema_analyzer.py:209-211)."""
    legacy = all_of(
        rx(C, LEGACY_FK_RX, dialect),
        "mode <> 'REPEATED'",
        f"NOT {pk_sql(dialect, cfg)}",
        KEY_TYPES)
    return any_of(_config_fk(dialect, cfg), legacy, _dv_fk(dialect))


def likely_pk_sql(dialect: str, cfg: PatternConfig = DEFAULT) -> str:
    """Enhanced-detection 'likely PK' (relationship_detector.py:180-207):
    explicit PK OR pattern match OR table-base-derived names."""
    tb = f"replace(replace({TBL}, 'dim_', ''), 'fact_', '')"
    return any_of(
        pk_sql(dialect, cfg),
        rx(C, LIKELY_PK_RX, dialect),
        f"{C} IN ({tb} || '_id', {tb} || '_key', 'id')")


def common_pk_sql(dialect: str) -> str:
    """Fallback common-PK names (relationship_detector.py:209-219)."""
    return inset(C, COMMON_PK_NAMES)


def strip_key_suffix_sql(col: str, dialect: str) -> str:
    """base name = column minus _(id|key|fk|pk|hk|hash_key) suffix
    (relationship_detector.py:271)."""
    return _fn(dialect, "regexp_replace", "regexp_replace",
               col, f"'{KEY_SUFFIX_RX}'", "''")


def type_compat_group_sql(col: str = "data_type") -> str:
    """Type compatibility groups (relationship_detector.py:925-941):
    canonical group key so compatible types equi-join."""
    return (
        f"(CASE WHEN upper({col}) IN ('INTEGER', 'INT64') THEN 'INT' "
        f"WHEN upper({col}) IN ('STRING', 'TEXT') THEN 'STR' "
        f"WHEN upper({col}) IN ('FLOAT', 'FLOAT64') THEN 'FLT' "
        f"WHEN upper({col}) IN ('BOOLEAN', 'BOOL') THEN 'BOOL' "
        f"ELSE upper({col}) END)")


def best_pk_order_sql() -> str:
    """Total-order sort key for _find_best_primary_key
    (relationship_detector.py:334-358): explicit PKs first (by ordinal),
    else 'id' columns, else first candidate by ordinal. Usable in both
    dialects as an ORDER BY fragment over (is_pk, name, ordinal)."""
    return ("is_pk DESC, (CASE WHEN is_pk THEN 0 "
            "WHEN lower(name) = 'id' THEN 0 ELSE 1 END), ordinal")


# ---------------------------------------------------------------------------
# S11 + P6 as a driver-checkable [Q] row (r6 verdict ask #9): a
# truth table over the metadata fixtures exercising every compiled-
# predicate branch — the rules-FILE loader path (a reference-format
# dict through PatternConfig.from_dict, as config.py:67-87 loads
# custom_rules.json in the reference) and every pattern_pred wildcard
# branch (exact IN-fold, '*suffix' ends, 'prefix*' starts, mid and
# multi wildcards through the anchored-regex fallback,
# pattern_config.py:321-336). Both dialects compile from the same rule
# data, so the oracle checks the DIALECT CORRECTNESS of the compiler
# (regexp_like vs regexp_matches, endswith vs ends_with, ...), which
# is exactly where a compiled predicate can silently diverge.
# ---------------------------------------------------------------------------

# reference-format rules file content (the shape config.py:67-87 loads)
TRUTH_RULES_FILE: dict = {
    "column_patterns": {
        "primary_key_indicators": ["id", "key", "pk"],
        "foreign_key_indicators": ["*_id", "*_fk", "hub_key"],
    },
    "table_patterns": {
        "data_vault": {
            "patterns": {
                "hub": {"prefix": "h_",
                        "primary_key_patterns": ["hash_key", "hk"],
                        "foreign_key_patterns": []},
                "link": {"prefix": "l_",
                         "primary_key_patterns": ["link_key"],
                         "foreign_key_patterns": ["*_hk", "*_hash_key"]},
            }
        },
        "traditional_dw": {
            "patterns": {
                "dimension": {"prefix": "dim_",
                              "primary_key_patterns": ["*_key", "sk"],
                              "foreign_key_patterns": ["*_id"]},
            }
        },
    },
    "filtering_rules": {"max_relationships_per_table": 3,
                        "min_confidence_threshold": 0.5},
}

# P6 wildcard battery: one pattern list per pattern_pred branch
TRUTH_WILDCARDS: dict[str, tuple[str, ...]] = {
    "w_exact": ("id", "key", "name"),
    "w_suffix": ("*_id",),
    "w_prefix": ("customer_*",),
    "w_mid": ("c*key",),
    "w_multi": ("*ust*",),
    "w_mixed": ("id", "*_code", "ref_*", "h*key"),
}


def _truth_exprs(d: str) -> list[tuple[str, str]]:
    from gcp_datalake_utils_spark.rules.config import PatternConfig
    cfg = PatternConfig.from_dict(TRUTH_RULES_FILE)
    exprs = [(alias, pattern_pred(C, pats, d))
             for alias, pats in TRUTH_WILDCARDS.items()]
    exprs += [
        ("file_pk", pk_sql(d, cfg)),
        ("file_fk", fk_sql(d, cfg)),
        ("dw_pk", _dw_pk(d)),
        ("dv_fk", _dv_fk(d)),
        ("common_pk", common_pk_sql(d)),
        ("base_name", strip_key_suffix_sql(C, d)),
        ("type_group", type_compat_group_sql()),
    ]
    return exprs


def rule_compiler_truth(spark):
    """[Q] S11/P6: compiled-predicate truth table over meta_columns."""
    from pyspark.sql import functions as F

    from gcp_datalake_utils_spark.catalog import fixtures as fx
    cols = fx.meta_columns_df(spark)
    sel = [F.col("table_id"), F.col("ordinal"), F.col("name")]
    sel += [F.expr(e).alias(a) for a, e in _truth_exprs("spark")]
    return cols.select(*sel)


def _rule_compiler_truth_oracle() -> str:
    from gcp_datalake_utils_spark.catalog import fixtures as fx
    sel = ",\n       ".join(f"{e} AS {a}" for a, e in _truth_exprs("duck"))
    return f"""
SELECT table_id, ordinal, name,
       {sel}
FROM {fx.meta_columns_values('c')}
"""


RULE_COMPILER_TRUTH_ORACLE = _rule_compiler_truth_oracle()
