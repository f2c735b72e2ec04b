"""Group B join operators (SURVEY.md §2 B5-B10): shuffle/broadcast equi-joins,
outer joins, semi/anti, cross/theta, and the as-of join.

Scale notes: dimension sides get explicit ``F.broadcast`` hints (they stay
small at any SF — region/nation/part/customer are classic broadcast dims);
fact-fact joins shuffle on their keys and rely on AQE for skew splitting.
The as-of join is expressed as join+max_by (aggregate form) rather than a
per-row sort-merge, so it stays a single shuffle on the equi-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.parity import bcount, dsum, dsum_sql
from ..registry import query
from ..session import load_tables


@query(
    "q_b05_join_revenue_by_priority",
    oracle=f"""
SELECT o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    group="B",
)
def join_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: fact-fact inner equi-join (lineitem x orders) + hash agg.
    Spark picks shuffle-hash/sort-merge; AQE may switch to broadcast at
    small SFs."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            dsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
            bcount().alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_b06_broadcast_join_brand_volume",
    oracle=f"""
SELECT p_brand, {dsum_sql('l_quantity')} AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
""",
    group="B",
)
def broadcast_join_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: explicit broadcast of the part dimension — no shuffle of the
    lineitem fact for the join itself (verify: BroadcastHashJoin in plan)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum("l_quantity").alias("sum_qty"), bcount().alias("n_items"))
        .orderBy("p_brand")
    )


@query(
    "q_b07_left_join_order_counts",
    oracle="""
SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name ORDER BY c_custkey
""",
    group="B",
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: LEFT OUTER join keeping customers with zero orders (COUNT(col)
    skips the NULLs from the unmatched side)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "q_b07_full_outer_nation_supplier",
    oracle="""
SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
""",
    group="B",
)
def full_outer_nation_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: FULL OUTER join — nations without suppliers surface NULL rows."""
    t = load_tables(spark, sf_dir)
    n = t["nation"]
    s = t["supplier"]
    return n.join(s, n["n_nationkey"] == s["s_nationkey"], "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@query(
    "q_b08_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
    group="B",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: LEFT SEMI join — customers having a big order (no duplication)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 100000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "q_b08_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
    group="B",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: LEFT ANTI join — customers with no *urgent* order.

    Round-1 used "no orders at all", which is empty at every fixture SF
    (each customer has orders) and proved only schema; the priority filter
    yields a real anti set (18 rows at sf0.001, 203 at sf0.01)."""
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "q_b09_cross_join",
    oracle="""
SELECT r.r_name, n.n_name,
       CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS in_region
FROM region r CROSS JOIN nation n
""",
    group="B",
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: explicit cross join (tiny dims only — guarded use at scale)."""
    t = load_tables(spark, sf_dir)
    return (
        t["region"]
        .crossJoin(t["nation"])
        .select(
            "r_name",
            "n_name",
            F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
            .otherwise(0)
            .alias("in_region"),
        )
    )


@query(
    "q_b09_theta_join",
    oracle=f"""
SELECT s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_richer_customers,
       {dsum_sql('c.c_acctbal - s.s_acctbal')} AS total_gap
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
GROUP BY s.s_suppkey ORDER BY s.s_suppkey
""",
    group="B",
)
def theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: theta join — equi-key plus a range predicate; Spark evaluates the
    inequality as a post-join filter on the hash-join output, keeping the
    shuffle keyed on the equi-part only (scale-safe)."""
    t = load_tables(spark, sf_dir)
    s = t["supplier"].alias("s")
    c = t["customer"].alias("c")
    return (
        s.join(
            c,
            (F.col("s.s_nationkey") == F.col("c.c_nationkey"))
            & (F.col("c.c_acctbal") > F.col("s.s_acctbal")),
        )
        .groupBy("s.s_suppkey")
        .agg(
            bcount().alias("n_richer_customers"),
            dsum(F.col("c.c_acctbal") - F.col("s.s_acctbal")).alias("total_gap"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_b10_asof_join",
    oracle="""
SELECT event_id, asof_orderkey, asof_orderdate, asof_price
FROM (
    SELECT e.event_id,
           o.o_orderkey AS asof_orderkey,
           o.o_orderdate AS asof_orderdate,
           o.o_totalprice AS asof_price,
           ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
           ) AS rn
    FROM events e
    JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
WHERE rn = 1
ORDER BY event_id
""",
    group="B",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: as-of join — for each event, that user's most recent order at or
    before the event timestamp (the classic "latest state as of t" lookup).
    Equi-key (user) join + range filter, then a per-event row_number window
    picks the latest; equivalent to DuckDB's ASOF JOIN but expressed with
    portable semantics (SURVEY §2 B10).

    Direction matters for non-vacuity: fixture orders (1995-2001) all
    precede fixture events (2024), so every event has a matching order —
    round-1's order->event direction returned 0 rows and proved only
    schema.  Determinism: o_orderdate has day resolution (ties possible),
    so the window order carries o_orderkey as a unique tiebreaker.

    Scale: one shuffle on the user equi-key for the join (range predicate
    stays a post-join filter, never a cartesian), one on event_id for the
    window; at 100 TB the window side is pre-bounded because each event
    keeps only its user's orders."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    e = t["events"]
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        e.join(
            o,
            (F.col("o_custkey") == F.col("user_id"))
            & (F.col("o_orderdate") <= F.col("ts")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
            F.col("o_totalprice").alias("asof_price"),
        )
        .orderBy("event_id")
    )


@query(
    "q_b05_null_safe_join",
    oracle="""
WITH a AS (
  SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp FROM customer
), b AS (
  SELECT NULLIF(n_nationkey % 5, 0) AS grp,
         CAST(COUNT(*) AS BIGINT) AS n_nations
  FROM nation GROUP BY 1
)
SELECT a.grp, CAST(COUNT(*) AS BIGINT) AS n_customers, MAX(b.n_nations) AS n_nations
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
GROUP BY a.grp ORDER BY a.grp NULLS FIRST
""",
    group="B",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 (cont.): NULL-SAFE equality join (<=> / IS NOT DISTINCT FROM) —
    plain '=' silently drops every NULL-keyed row (NULL = NULL is NULL);
    the null-safe operator matches NULL to NULL, the semantics CDC merges
    and late-typed dimensions actually need.  Spark hashes null-safe keys
    like any other equi-key, so the plan is still a hash join — not the
    nested-loop fallback a naive `a = b OR (a IS NULL AND b IS NULL)`
    predicate would get."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp")
    )
    b = (
        t["nation"]
        .select(F.nullif(F.col("n_nationkey") % 5, F.lit(0)).alias("grp"))
        .groupBy("grp")
        .agg(bcount().alias("n_nations"))
    )
    return (
        a.join(F.broadcast(b), a["grp"].eqNullSafe(b["grp"]))
        .groupBy(a["grp"].alias("grp"))
        .agg(
            bcount().alias("n_customers"),
            F.max("n_nations").alias("n_nations"),
        )
        .orderBy(F.col("grp").asc_nulls_first())
    )
