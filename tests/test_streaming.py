"""Structured Streaming surface: windowed aggs, streaming dedup,
sessions — streaming results must match their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_events
from gcp_datalake_utils_spark.streaming import windows as sw


def test_windowed_counts_match_batch(spark, sf_dir):
    stream_out = sw.run_available_now(
        sw.windowed_counts_stream(spark, sf_dir), "t_hourly")
    batch = (load_events(spark, sf_dir)
             .groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count("*").alias("n_events")))
    got = {(r["window"]["start"], r["event_type"]): r["n_events"]
           for r in stream_out.collect()}
    want = {(r["window"]["start"], r["event_type"]): r["n_events"]
            for r in batch.collect()}
    assert got == want


def test_streaming_dedup_drops_nothing_on_unique_ids(spark, sf_dir):
    out = sw.run_available_now(sw.dedup_stream(spark, sf_dir), "t_dedup")
    n_in = load_events(spark, sf_dir).count()
    assert out.count() == n_in  # event_id is unique in the testdata


def test_sessions_have_positive_counts(spark, sf_dir):
    rows = sw.user_sessions(spark, sf_dir).collect()
    assert rows and all(r.n_events >= 1 for r in rows)
