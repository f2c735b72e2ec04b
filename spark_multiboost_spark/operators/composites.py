"""Composite analytics queries (TPC-H-shaped) + scale patterns.

These exercise multi-join + agg + sort pipelines end-to-end (the shapes the
fixture star schema exists for) and document the 100 TB skew playbook as
runnable, oracle-checked code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import bcount, dsum, dsum_sql
from ..registry import query
from ..session import load_tables


@query(
    "q_comp_shipping_priority",
    oracle=f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2024-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
""",
    group="B",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two joins -> agg -> top-k.
    The customer filter is applied BEFORE the join (Catalyst pushes it into
    the scan) and the small filtered dim broadcasts."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("2024-06-30 00:00:00").cast("timestamp")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


@query(
    "q_comp_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    group="B",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with a co-nationality predicate; dims
    broadcast, facts shuffle once on orderkey."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
            bcount().alias("n_items"),
        )
        .orderBy("n_name")
    )


@query(
    "q_comp_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    group="B",
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_ext_salted_agg",
    oracle=f"""
SELECT l_returnflag, {dsum_sql('l_quantity')} AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    group="B",
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew playbook: two-stage salted aggregation. The 3-value
    l_returnflag key is maximally skewed — a naive groupBy lands all rows
    on 3 reducers. Stage 1 aggregates on (key, salt) spreading each hot key
    over 16 partitions; stage 2 merges the partials. Same semantics as the
    plain GROUP BY oracle (decimal sums make the two-stage merge exact),
    ~16x better reducer parallelism at 100 TB.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    n_salts = 16
    salted = li.withColumn("salt", (F.col("l_orderkey") % n_salts).cast("int"))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("part_qty"),
        F.count(F.lit(1)).alias("part_n"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("part_qty").cast("double").alias("sum_qty"),
            F.sum("part_n").cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query("q_d7_estimator_end_to_end", oracle=None, group="D")
def estimator_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: the reference's whole purpose end-to-end — fit AdaBoostMHClassifier
    on embeddings, transform, and report per-label prediction stats
    (rows-only: training is iterative)."""
    from ..ml.estimator import AdaBoostMHClassifier

    emb = load_tables(spark, sf_dir)["embeddings"]
    model = AdaBoostMHClassifier(numRounds=3, numClasses=10).fit(emb)
    out = model.transform(emb)
    return (
        out.select(
            "label",
            F.size("predicted_labels").alias("n_predicted"),
            F.expr("array_contains(predicted_labels, label)").alias("self_predicted"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("n_predicted").cast("bigint")).alias("total_predictions"),
        )
        .orderBy("label")
    )
