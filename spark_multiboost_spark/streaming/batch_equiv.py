"""Group C batch equivalents (SURVEY.md §2 C1-C3, C7) over the events table.

These run the SAME windowing operators Structured Streaming uses
(F.window / F.session_window are shared between batch and streaming plans),
so the batch oracle checks the exact aggregation semantics a stream would
produce after watermark close; streaming/jobs.py replays them through a real
readStream for the rows-only C4-C6 checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import bcount, dsum, dsum_sql
from ..registry import query
from ..session import load_tables


@query(
    "q_c1_tumbling_window",
    oracle=f"""
SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
    group="C",
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: 1-hour tumbling window aggregation via F.window (the streaming
    operator), oracle via date_trunc."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(bcount().alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q_c2_sliding_window",
    oracle=f"""
WITH shifted AS (
  SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
           + INTERVAL (15 * CAST(FLOOR(EXTRACT(minute FROM CAST(ts AS TIMESTAMP)) / 15) AS INT)) MINUTE
           - INTERVAL (15 * k.k) MINUTE AS window_start,
         value
  FROM events
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('value')} AS sum_value
FROM shifted
GROUP BY window_start ORDER BY window_start
""",
    group="C",
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: 1-hour window sliding every 15 minutes — each event lands in 4
    windows; oracle enumerates the 4 covering starts per event."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(bcount().alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


@query(
    "q_c3_session_window",
    oracle="""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session,
         event_id
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    group="C",
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: 30-minute-gap session windows via the REAL F.session_window
    operator; oracle via the lag+cumulative-flag islands construction
    (SURVEY §7 known-hard: islands SQL validated by unit test first)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(bcount().alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_c7_stream_static_join",
    oracle=f"""
SELECT c.c_mktsegment, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    group="C",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: the batch twin of a stream-static enrichment join (events stream
    x customer dim); the dim side is broadcast — on a cluster the stream
    never shuffles."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .join(F.broadcast(t["customer"]), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(bcount().alias("n"), dsum("value").alias("sum_value"))
        .orderBy("c_mktsegment", "event_type")
    )


@query(
    "q_c5_windowed_dedup_twin",
    oracle="""
WITH flagged AS (
  SELECT event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM flagged GROUP BY event_type ORDER BY event_type
""",
    group="C",
)
def windowed_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5's exact-oracle batch twin: keep the FIRST event per
    (user, type, 1h-window), count keeps/drops per type.  The streaming
    form (q_c5_stream_dedup, dropDuplicatesWithinWatermark) is rows-only by
    contract; this twin pins the dedup-key semantics against DuckDB so the
    window+key grouping logic itself is hash-verified.

    Scale shape: one shuffle on the dedup key (user, type, hour) — exactly
    the state partitioning the streaming operator uses; the keep flag is a
    row_number with a unique (ts, event_id) tiebreaker."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts"))
    ).orderBy("ts", "event_id")
    flagged = e.withColumn("rn", F.row_number().over(w))
    return (
        flagged.groupBy("event_type")
        .agg(
            bcount().alias("n_events"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        )
        .orderBy("event_type")
    )
