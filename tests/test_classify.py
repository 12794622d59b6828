"""Classification-rule behavior on the reference's own test fixtures
(mirrors /root/reference/bigquery-to-erd/test_config.py expectations)."""

from __future__ import annotations

from gcp_datalake_utils_spark.operators.classify import classified_columns


def _flags(spark, table, name):
    row = (classified_columns(spark)
           .where(f"table_id = '{table}' AND name = '{name}'")
           .collect())
    assert len(row) == 1, f"{table}.{name} missing"
    return row[0]


def test_data_vault_hub_pk(spark):
    assert _flags(spark, "h_adam", "id")["is_pk"]
    assert _flags(spark, "h_adam", "hash_key")["is_pk"]
    assert _flags(spark, "h_customer", "business_key")["is_pk"]


def test_dim_surrogate_and_fk(spark):
    r = _flags(spark, "dim_ishuv", "dim_key")
    assert r["is_pk"] and r["is_fk"]
    r = _flags(spark, "dim_ishuv", "adam_id")
    assert r["is_fk"]


def test_link_hub_references(spark):
    assert _flags(spark, "l_adam_misgeret", "adam_hk")["is_fk"]
    assert _flags(spark, "l_adam_misgeret", "misgeret_hk")["is_fk"]


def test_ref_code_pk(spark):
    assert _flags(spark, "ref_code_status", "status_code")["is_pk"]
    assert not _flags(spark, "ref_code_status", "description")["is_pk"]


def test_repeated_never_key(spark):
    r = _flags(spark, "products", "tags")
    assert not r["is_pk"] and not r["is_fk"]


def test_float_ids_are_not_pks(spark):
    # FLOAT64 is outside the key-candidate types (schema_analyzer.py:185)
    r = _flags(spark, "telemetry", "metric_id")
    assert not r["is_pk"] and r["is_fk"]


def test_tpch_suffixless_names_unclassified(spark):
    r = _flags(spark, "customer", "c_custkey")
    assert not r["is_pk"] and not r["is_fk"]
