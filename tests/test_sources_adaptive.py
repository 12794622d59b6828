"""Loader resilience against testdata-generator drift.

The driver has regenerated events.parquet with different physical ts
types across rounds (TIMESTAMP(NANOS) read as long via nanosAsLong,
then TIMESTAMP_NTZ micros). ``event_ts_to_micros`` must map every
generation to the same microsecond TimestampType wall-clock so all
events operators and their DuckDB oracles stay in agreement.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gcp_datalake_utils_spark.sources import load_events
from gcp_datalake_utils_spark.sources.registry import event_ts_to_micros

# one exact-microsecond instant + one with sub-microsecond nanos that
# must truncate (not round) to match DuckDB's TIMESTAMP_NS -> TIMESTAMP
_MICROS = [1700000000_000_000, 1700000123_456_789]


def _write(tmpdir: str, name: str, arr: pa.Array) -> str:
    path = os.path.join(tmpdir, name)
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2], pa.int64()), "ts": arr}),
        path)
    return path


@pytest.mark.parametrize("ts_type", ["ns", "us_ntz"])
def test_event_ts_generations_load_identically(spark, tmp_path, ts_type):
    d = str(tmp_path)
    if ts_type == "ns":
        arr = pa.array([m * 1000 + 999 for m in _MICROS],
                       pa.timestamp("ns"))
    else:
        arr = pa.array(_MICROS, pa.timestamp("us"))
    path = _write(d, "events.parquet", arr)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = event_ts_to_micros(spark.read.parquet(path))
    assert [f.dataType.typeName() for f in df.schema.fields
            if f.name == "ts"] == ["timestamp"]
    got = {r.event_id: r.ts for r in df.collect()}
    import datetime as dt
    for eid, micros in zip((1, 2), _MICROS):
        # integer timedelta arithmetic: float epoch seconds would lose
        # sub-microsecond precision at 2023-epoch magnitudes
        want = (dt.datetime(1970, 1, 1)
                + dt.timedelta(microseconds=micros))
        # exact to the microsecond: nanos truncate, micros pass through
        assert got[eid] == want, (eid, ts_type, got[eid], want)


def test_load_events_current_testdata_is_timestamp(spark, sf_dir):
    df = load_events(spark, sf_dir)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.where("ts IS NULL").count() == 0
