"""Group B window functions (SURVEY.md §2 B16-B18, B20): ranking, analytic,
frame aggregates, top-k per group.

Determinism discipline: every ORDER BY inside a window spec carries a unique
tiebreaker (FIXTURES.md §3) except where ties are semantically required for
rank/dense_rank — those orderings are still value-deterministic. Frame sums
use the decimal-cast parity path so sliding-frame accumulation order
(segment trees in DuckDB vs streaming in Spark) can't flip low bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_tables

DEC = "decimal(18,6)"


@query(
    "q_b16_ranking",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
       CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
FROM customer
""",
    group="B",
)
def ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: row_number/ntile over a unique ordering; rank/dense_rank over a
    tied ordering (values deterministic even with ties)."""
    c = load_tables(spark, sf_dir)["customer"]
    w_unique = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    w_tied = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w_unique).cast("bigint").alias("rn"),
        F.rank().over(w_tied).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_tied).cast("bigint").alias("drnk"),
        F.ntile(4).over(w_unique).cast("bigint").alias("quartile"),
    )


@query(
    "q_b17_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       FIRST_VALUE(value) OVER w AS first_value,
       LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    group="B",
)
def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: lag/lead/first/last over per-user event timelines."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w_full).alias("final_value"),
    )


@query(
    "q_b18_frames",
    oracle=f"""
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
FROM events
""",
    group="B",
)
def frame_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: running sum + 3-row moving average over explicit ROWS frames."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    mov = w.rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast(DEC)).over(run).cast("double").alias("running_sum"),
        (
            F.sum(F.col("value").cast(DEC)).over(mov).cast("double")
            / F.count("value").over(mov)
        ).alias("moving_avg3"),
        F.count(F.lit(1)).over(run).cast("bigint").alias("n_so_far"),
    )


@query(
    "q_b20_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
  FROM customer JOIN orders ON c_custkey = o_custkey
) WHERE rank <= 3
""",
    group="B",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: top-3 orders per customer. The rank<=k filter is rewritten by
    InferWindowGroupLimit into a map-side partial group limit (verified in
    the flagship plan too) — the scale-safe distributed top-k."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


@query(
    "q_ext_dist_rank",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6) AS cume
FROM orders
""",
    group="B",
)
def dist_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 (cont.): distribution window functions percent_rank/cume_dist —
    rank-based, so exact across engines (ordering carries a unique
    tiebreaker)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_b18_range_interval_frame",
    oracle="""
WITH framed AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
         ) AS DOUBLE) AS hour_sum,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
         ) AS n_in_hour
  FROM events
)
SELECT user_id,
       CAST(MAX(n_in_hour) AS BIGINT) AS max_events_per_hour,
       MAX(hour_sum) AS max_hour_sum
FROM framed GROUP BY user_id ORDER BY user_id
""",
    group="B",
)
def range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 (cont.): RANGE frames bounded by a TIME INTERVAL — each event's
    trailing-1-hour sum/count per user (the sliding-window-join-free way to
    ask "how much in the last hour", and the rate-limiter/alerting shape).
    ROWS frames (q_b18_frames) count rows; RANGE-interval frames bound by
    the ORDER BY value, so ties and gaps behave correctly.

    Float discipline: the frame sum goes through DECIMAL (order-exact);
    MAX over per-row exact values is engine-independent.  Scale: one
    shuffle on user_id; frame state is bounded by events-per-hour."""
    e = load_tables(spark, sf_dir)["events"]
    e.createOrReplaceTempView("v_events_rif")
    return spark.sql(
        """
WITH framed AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
         ) AS DOUBLE) AS hour_sum,
         COUNT(1) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
         ) AS n_in_hour
  FROM v_events_rif
)
SELECT user_id,
       CAST(MAX(n_in_hour) AS BIGINT) AS max_events_per_hour,
       MAX(hour_sum) AS max_hour_sum
FROM framed GROUP BY user_id ORDER BY user_id
"""
    )
