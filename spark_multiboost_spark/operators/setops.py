"""Group B set operations (SURVEY.md §2 B21-B22)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_tables


@query(
    "q_b21_union_all",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
""",
    group="B",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: UNION ALL via unionByName (no dedup, no shuffle)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = t["supplier"].select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "q_b21_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    group="B",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: UNION DISTINCT = unionByName + distinct (one hash shuffle)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "q_b22_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    group="B",
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: INTERSECT (distinct semantics) — nations with both customers
    and suppliers."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_b22_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
    group="B",
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: EXCEPT (distinct) — customers with urgent orders but no low-
    priority ones.  Round-1 subtracted supplier nations from customer
    nations, which is empty (both cover all 25 nations) and proved only
    schema; this set is 17 rows at sf0.001, 188 at sf0.01."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(low)


@query(
    "q_b22_except_all",
    oracle="""
SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25
EXCEPT ALL
SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 40
""",
    group="B",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: EXCEPT ALL (bag semantics — multiplicity-aware subtraction)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.filter(F.col("l_quantity") > 25).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") > 40).select(F.col("l_returnflag").alias("flag"))
    return a.exceptAll(b)


@query(
    "q_b22_intersect_all",
    oracle="""
SELECT o_orderstatus AS status, o_orderpriority AS priority
FROM orders WHERE o_totalprice > 50000
INTERSECT ALL
SELECT o_orderstatus AS status, o_orderpriority AS priority
FROM orders WHERE o_totalprice < 150000
""",
    group="B",
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: INTERSECT ALL (bag intersection)."""
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(F.col("o_totalprice") > 50000).select(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    )
    b = o.filter(F.col("o_totalprice") < 150000).select(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    )
    return a.intersectAll(b)
