"""Config-driven rule compiler: custom PatternConfig changes
classification and unlocks the naming-convention strategy."""

from __future__ import annotations

from gcp_datalake_utils_spark.operators import detection
from gcp_datalake_utils_spark.operators.classify import classified_columns
from gcp_datalake_utils_spark.rules.config import DEFAULT, PatternConfig


def test_default_matches_shipped_reference_config():
    # loading the reference-format JSON shape reproduces DEFAULT
    shipped = {
        "table_patterns": {
            "data_vault": {"patterns": {
                "hub": {"prefix": "h_",
                        "primary_key_patterns": list(
                            DEFAULT.table_patterns["h_"]["pk"]),
                        "foreign_key_patterns": []},
            }},
        },
        "column_patterns": {
            "primary_key_indicators": list(DEFAULT.pk_indicators),
            "foreign_key_indicators": list(DEFAULT.fk_indicators),
        },
        "filtering_rules": {
            "max_relationships_per_table": 3,
            "min_confidence_threshold": 0.5,
            "preferred_detection_methods": ["enhanced_pk_fk",
                                            "data_vault_pattern"],
        },
    }
    cfg = PatternConfig.from_dict(shipped)
    assert cfg.pk_indicators == DEFAULT.pk_indicators
    assert cfg.fk_indicators == DEFAULT.fk_indicators
    assert cfg.table_patterns["h_"]["pk"] == \
        DEFAULT.table_patterns["h_"]["pk"]
    assert cfg.max_relationships_per_table == 3


def test_custom_config_changes_classification(spark):
    # drop the global *_id FK indicator: user_id is no longer
    # config-flagged... but the legacy fallback still applies unless the
    # column fails its guards — use a FLOAT column to see the difference
    no_fk_cfg = PatternConfig(
        pk_indicators=DEFAULT.pk_indicators,
        fk_indicators=(),
        table_patterns=DEFAULT.table_patterns)
    cls = classified_columns(spark, config=no_fk_cfg)
    row = cls.where("table_id = 'telemetry' AND name = 'metric_id'") \
        .collect()[0]
    # FLOAT64 fails the legacy type guard and telemetry has no DV
    # prefix, so without the config indicator the column is unflagged
    assert not row["is_fk"]
    default_row = classified_columns(spark).where(
        "table_id = 'telemetry' AND name = 'metric_id'").collect()[0]
    assert default_row["is_fk"]


def test_naming_convention_fires_under_custom_config(spark):
    # With the global FK indicators disabled, orders2.user_id loses its
    # config FK flag; the legacy fallback also rejects it because the
    # column classifies as PK (REQUIRED INT64 *_id) and legacy FK
    # excludes PKs. Non-FK {x}_id columns are exactly J4's input, so
    # the naming-convention strategy finally fires: user_id -> users.
    # (The hardcoded DV chains still apply — they are code, not config,
    # in the reference as well.)
    cfg = PatternConfig(
        pk_indicators=DEFAULT.pk_indicators,
        fk_indicators=(),
        table_patterns={"h_": DEFAULT.table_patterns["h_"]})
    cls = classified_columns(spark, config=cfg)
    row = cls.where(
        "table_id = 'orders2' AND name = 'user_id'").collect()[0]
    assert not row["is_fk"]
    j4 = detection.detect_naming_conventions(spark, cls).collect()
    hits = [r for r in j4 if r.source_table == "orders2"
            and r.source_column == "user_id"
            and r.target_table == "users"]
    assert hits, f"user_id -> users missing from J4: {j4}"
    # default config: the same column is FK-flagged and J4 skips it
    n_default = detection.detect_naming_conventions(
        spark, classified_columns(spark)).count()
    assert n_default == 0