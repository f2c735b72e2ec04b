"""Streaming semantics tests (SURVEY.md §5.2 item 4): replay equivalence,
late-data handling, dedup, and stateful processing."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_multiboost_spark.registry import all_queries
from spark_multiboost_spark.session import load_tables


def test_c4_watermark_final_windows_match_batch(spark, sf_dir):
    """Windows finalized by the watermark must equal the batch C1 answer
    for those windows (replay in event-time order drops nothing)."""
    stream_out = all_queries()["q_c4_watermark_tumbling"].fn(spark, sf_dir)
    batch = (
        load_tables(spark, sf_dir)["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    s = {(r["window_start"], r["event_type"]): r["n"] for r in stream_out.collect()}
    b = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
    # append mode withholds unfinalized windows; everything emitted must
    # match batch exactly
    assert len(s) > 0
    for k, v in s.items():
        assert b.get(k) == v, f"window {k}: stream={v} batch={b.get(k)}"


def test_c5_dedup_removes_injected_dupes(spark, sf_dir):
    out = all_queries()["q_c5_stream_dedup"].fn(spark, sf_dir)
    events = load_tables(spark, sf_dir)["events"]
    expected = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r["event_type"]: r["n"] for r in out.collect()}
    assert got == expected  # duplicates fully removed


def test_c6_stateful_final_counts(spark, sf_dir):
    out = all_queries()["q_c6_stateful_sessions"].fn(spark, sf_dir)
    events = load_tables(spark, sf_dir)["events"]
    expected = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # update mode emits one row per user per batch; the max n_events per
    # user must equal the total batch count
    final = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    got = {r["user_id"]: r["n_events"] for r in final}
    assert got == expected
