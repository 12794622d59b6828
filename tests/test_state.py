"""State layer: checksum gate, upsert, JSON persistence, cache TTL."""

from __future__ import annotations

from gcp_datalake_utils_spark.operators import state


def test_checksum_gate_statuses(spark, sf_dir):
    rows = {r.table_id: r.status
            for r in state.checksum_gate(spark, sf_dir).collect()}
    assert rows["nation"] == "changed"      # stale checksum fixture
    assert rows["orders"] == "new"          # absent from state
    assert rows["region"] == "unchanged"    # checksum matches
    assert "dropped_table" not in rows      # only current tables


def test_state_upsert_timestamps(spark, sf_dir):
    rows = {r.table_id: r.last_processed
            for r in state.state_upsert(spark, sf_dir).collect()}
    # changed/new tables move to the as-of instant; unchanged keep theirs
    assert rows["nation"] == state.STALE_AS_OF
    assert rows["orders"] == state.STALE_AS_OF
    assert rows["region"] == "2024-06-01 12:00:00"


def test_state_json_roundtrip(spark, sf_dir, tmp_path):
    st = state.state_upsert(spark, sf_dir)
    path = str(tmp_path / "state_json")
    state.save_state_json(st, path)
    back = state.load_state_json(spark, path)
    assert back.count() == st.count()
    assert set(back.columns) == set(st.columns)


def test_cache_ttl_hits(spark, sf_dir):
    rows = state.cache_lookup(spark, sf_dir).collect()
    hits = {(r.source_table, r.target_table)
            for r in rows if r.cache_hit}
    # fresh fixture entries hit (pair key is sorted, so both directions)
    assert ("orders", "customer") in hits \
        or ("customer", "orders") in hits
    # expired entries never hit
    misses = {(r.source_table, r.target_table): r.cache_hit
              for r in rows}
    for pair, hit in misses.items():
        if set(pair) == {"nation", "region"}:
            assert not hit
