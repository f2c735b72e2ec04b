"""Group B SQL surface (SURVEY.md §2 B30-B31): subqueries (scalar, IN,
EXISTS, correlated) and CTEs, expressed via ``spark.sql`` over the registered
temp views — Catalyst decorrelates these into joins (verify: no per-row
subquery execution in the plan).

Where both dialects accept the identical text, the Spark SQL string IS the
oracle string (single source of truth). Scalar comparisons against float
aggregates use the decimal-sum average so the threshold is bit-identical in
both engines (no membership flapping at the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..session import load_tables

# identical text in Spark SQL and DuckDB.  Threshold is 1.5x the average:
# round-1 used 2x, but the fixture price cap (~500k) sits at ~2x the mean,
# so the result was empty at every SF and the green check proved only
# schema.  1.5x selects ~380 rows at sf0.001 / ~3.7k at sf0.01.
_SCALAR_SUBQ = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    FROM orders)
"""


@query("q_b30_scalar_subquery", oracle=_SCALAR_SUBQ, group="B")
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: scalar subquery — orders above 1.5x the average price."""
    load_tables(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ)


_IN_SUBQ = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
  AND c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
"""


@query("q_b30_in_subquery", oracle=_IN_SUBQ, group="B")
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: IN / NOT IN subqueries (planned as semi/anti joins)."""
    load_tables(spark, sf_dir)
    return spark.sql(_IN_SUBQ)


_CORR_EXISTS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
"""


@query("q_b30_correlated_exists", oracle=_CORR_EXISTS, group="B")
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: correlated EXISTS / NOT EXISTS — decorrelated to semi/anti."""
    load_tables(spark, sf_dir)
    return spark.sql(_CORR_EXISTS)


_CORR_SCALAR = """
SELECT c_custkey, c_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_finished
FROM customer c
"""


@query("q_b30_correlated_scalar", oracle=_CORR_SCALAR, group="B")
def correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: correlated scalar subquery in the SELECT list."""
    load_tables(spark, sf_dir)
    return spark.sql(_CORR_SCALAR)


_CTE = """
WITH nation_customers AS (
    SELECT n_nationkey, n_name, n_regionkey, c_custkey
    FROM nation JOIN customer ON n_nationkey = c_nationkey
), order_revenue AS (
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT nc.n_name,
       CAST(SUM(CAST(COALESCE(orv.total_spend, 0) AS DECIMAL(18,6))) AS DOUBLE) AS nation_spend,
       CAST(SUM(COALESCE(orv.n_orders, 0)) AS BIGINT) AS nation_orders,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM nation_customers nc
LEFT JOIN order_revenue orv ON nc.c_custkey = orv.o_custkey
GROUP BY nc.n_name
ORDER BY nc.n_name
"""


@query("q_b31_cte_nation_revenue", oracle=_CTE, group="B")
def cte_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: chained CTEs -> join -> reaggregation (nation-level rollup of
    per-customer spend)."""
    load_tables(spark, sf_dir)
    return spark.sql(_CTE)
