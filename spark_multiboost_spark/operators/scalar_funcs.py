"""Group B scalar-function surface (SURVEY.md §2 B23-B29): string, date/time,
math, conditional, array, map, and JSON functions.

All JVM-side built-ins (whole-stage codegen) — the fast path. Dialect
landmines handled per SURVEY §7 known-hard list: datediff arg order, extract
return types (BIGINT both sides), explicit casts everywhere a default type
differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import load_tables


@query(
    "q_b23_strings",
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       CONCAT(p_brand, '#', p_type) AS brand_type,
       TRIM(CONCAT(' ', p_name, ' ')) AS name_trimmed,
       REPLACE(p_type, 'a', '_') AS type_repl,
       STRING_SPLIT(p_name, ' ')[1] AS first_word
FROM part
""",
    group="B",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: core string functions on the part dimension."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.replace(F.col("p_type"), F.lit("a"), F.lit("_")).alias("type_repl"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


@query(
    "q_b23_regexp",
    oracle="""
SELECT doc_id,
       REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_token,
       CAST(REGEXP_MATCHES(text, 'spark') AS BOOLEAN) AS mentions_spark,
       REGEXP_REPLACE(text, '[aeiou]', '*', 'g') AS devoweled_prefix
FROM (SELECT doc_id, SUBSTRING(text, 1, 40) AS text FROM documents)
""",
    group="B",
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: regexp extract/match/replace (POSIX-compatible patterns only, so
    Java and RE2-ish engines agree). DuckDB regexp_replace needs the 'g'
    flag to match Spark's replace-all semantics."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.select("doc_id", F.substring("text", 1, 40).alias("text"))
    return t.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_token"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.regexp_replace("text", "[aeiou]", "*").alias("devoweled_prefix"),
    )


@query(
    "q_b24_datetime",
    oracle="""
SELECT o_orderkey,
       DATE_TRUNC('month', o_orderdate) AS order_month,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_mon,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
       CAST(DATEDIFF('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_y24,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
FROM orders
""",
    group="B",
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: date_trunc/extract/datediff/add_months/last_day.
    Arg-order landmine: Spark datediff(end, start) == DuckDB
    datediff('day', start, end)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_y24"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus3m"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@query(
    "q_b25_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       ROUND(ABS(l_discount - 0.05), 6) AS disc_dev,
       ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
       ROUND(EXP(l_discount), 6) AS disc_exp,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(POW(l_quantity, 2), 6) AS qty_sq,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_bucket
FROM lineitem WHERE l_orderkey % 50 = 0
""",
    group="B",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: round/abs/sqrt/exp/ln/pow/sign/mod/floor — IEEE doubles are
    bit-identical cross-engine for per-row math, so round(6) is belt and
    braces only."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
    )


@query(
    "q_b26_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 150000 THEN 'large'
            WHEN o_totalprice >= 50000 THEN 'medium'
            ELSE 'small' END AS size_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
       GREATEST(o_totalprice, 100000.0) AS price_floor100k,
       LEAST(o_totalprice, 100000.0) AS price_cap100k,
       CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
            THEN 1 ELSE 0 END AS is_urgent
FROM orders
""",
    group="B",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: CASE WHEN / coalesce / nullif / greatest / least."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_cap100k"),
        F.when(
            F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"), 1
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


@query(
    "q_b27_arrays",
    oracle="""
SELECT doc_id,
       CAST(LEN(tokens) AS BIGINT) AS n_tokens,
       ARRAY_TO_STRING(LIST_SLICE(tokens, 1, 5), '-') AS first5,
       CAST(LIST_CONTAINS(tokens, 'spark') AS BOOLEAN) AS has_spark,
       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_SLICE(tokens, 1, 8))), ',') AS first8_sorted_distinct,
       CAST(LEN(LIST_FILTER(tokens, t -> LENGTH(t) > 4)) AS BIGINT) AS n_long_tokens
FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS tokens FROM documents)
""",
    group="B",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: array size/slice/join/contains/sort/distinct + lambda filter —
    Catalyst higher-order functions, no Python."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.select("doc_id", F.split("text", " ").alias("tokens"))
    return t.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.array_join(F.slice("tokens", 1, 5), "-").alias("first5"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.array_join(
            F.sort_array(F.array_distinct(F.slice("tokens", 1, 8))), ","
        ).alias("first8_sorted_distinct"),
        F.size(F.filter("tokens", lambda x: F.length(x) > 4))
        .cast("bigint")
        .alias("n_long_tokens"),
    )


@query(
    "q_b27_explode",
    oracle="""
SELECT event_type, CAST(pos AS BIGINT) AS pos, tag
FROM (SELECT DISTINCT event_type FROM events)
CROSS JOIN (VALUES ('a', 1), ('b', 2), ('c', 3)) AS u(tag, pos)
ORDER BY event_type, pos
""",
    group="B",
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: posexplode of a literal array against distinct keys (0-based in
    Spark -> align to DuckDB's 1-based ordinality by +1)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.select("event_type")
        .distinct()
        .select(
            "event_type", F.posexplode(F.array(F.lit("a"), F.lit("b"), F.lit("c")))
        )
        .select(
            "event_type",
            (F.col("pos") + 1).cast("bigint").alias("pos"),
            F.col("col").alias("tag"),
        )
        .orderBy("event_type", "pos")
    )


@query(
    "q_b28_map_funcs",
    oracle="""
SELECT event_id,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_csv,
       map_extract(m, 'type')[1] AS type_val,
       CAST(map_extract(m, 'val')[1] AS DOUBLE) AS val_num
FROM (
    SELECT event_id,
           MAP {'type': event_type, 'val': CAST(value AS VARCHAR)} AS m
    FROM events
)
""",
    group="B",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: map construction + map_keys/element_at.

    Output is scalar-only (the key list is flattened to a CSV string) so
    the driver's canonicalizer can sort/hash it — raw ARRAY columns are
    unhashable in its pandas path.  The map value round-trips
    double->string->double, which is exact in both engines (shortest-repr
    cast), so ``val_num`` oracle-matches without string-format parity.
    """
    e = load_tables(spark, sf_dir)["events"]
    m = e.select(
        "event_id",
        F.create_map(
            F.lit("type"), F.col("event_type"), F.lit("val"), F.col("value").cast("string")
        ).alias("m"),
    )
    return m.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys("m"))).alias("keys_csv"),
        F.element_at("m", "type").alias("type_val"),
        F.element_at("m", "val").cast("double").alias("val_num"),
    )


@query(
    "q_b29_json",
    oracle="""
SELECT event_id,
       CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k,
       CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) % 10 AS k_mod10
FROM events
""",
    group="B",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: JSON path extraction from the events.props payload column."""
    e = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select("event_id", k.alias("k"), (k % 10).alias("k_mod10"))


@query(
    "q_b29_variant",
    oracle="""
SELECT json_extract(props, '$.k')::BIGINT AS k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY k ORDER BY k NULLS FIRST
""",
    group="B",
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29 (Spark 4): semi-structured access through the VARIANT type —
    parse_json once, then typed variant_get paths. At scale VARIANT beats
    repeated get_json_object string re-parsing (one binary-encoded parse,
    shredded columnar access). Values agree with DuckDB's json_extract."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select(F.parse_json("props").alias("v"))
        .select(F.expr("variant_get(v, '$.k', 'bigint')").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("k").asc_nulls_first())
    )


@query(
    "q_ext_try_funcs",
    oracle="""
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(COALESCE(l_extendedprice /
                  (CASE WHEN l_linenumber > 4 THEN 0
                        ELSE POWER(2, l_linenumber) END), 0)
                     AS DECIMAL(38,6))) AS DOUBLE) AS safe_ratio_sum,
       CAST(SUM(CASE WHEN TRY_CAST(l_returnflag AS INTEGER) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber
""",
    group="B",
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: try_divide (NULL on /0, never a job
    failure) and try_cast — at 100 TB a single malformed row must not kill
    a stage, so the pipeline-safe forms are the default posture. Divisors
    are dyadic (2^k, k<=4) so the quotient is an exact <=6-decimal value:
    the decimal-path SUM then involves NO rounding, sidestepping the
    double->decimal tie-break differences between engines (DuckDB's
    division errors on /0, so its twin spells the NULL via CASE)."""
    from ..functions.parity import bcount

    li = load_tables(spark, sf_dir)["lineitem"]
    divisor = F.when(F.col("l_linenumber") > 4, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.col("l_linenumber"))
    )
    safe = F.coalesce(F.try_divide(F.col("l_extendedprice"), divisor), F.lit(0.0))
    return (
        li.groupBy("l_linenumber")
        .agg(
            bcount().alias("n"),
            F.sum(safe.cast("decimal(38,6)")).cast("double").alias("safe_ratio_sum"),
            F.sum(
                F.when(F.col("l_returnflag").try_cast("int").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_uncastable"),
        )
        .orderBy("l_linenumber")
    )


@query(
    "q_b23_collation_group",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_type) ELSE p_type END
           AS type_mixed,
         p_retailprice
  FROM part
)
SELECT LOWER(type_mixed) AS p_type_ci,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM mixed GROUP BY LOWER(type_mixed) ORDER BY p_type_ci
""",
    group="B",
)
def collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 (cont.): Spark 4 COLLATION-aware grouping — the column is
    deliberately case-mangled (UPPER on even partkeys), then grouped under
    UTF8_LCASE collation, which merges case variants WITHOUT rewriting the
    data (the oracle proves the grouping equals an explicit LOWER()
    normalization).  Collations matter at scale because they push into
    comparisons everywhere — joins, sorts, aggregations — instead of
    materializing normalized shadow columns; the session-level alternative
    (CREATE TABLE ... DEFAULT COLLATION) applies the same semantics
    lake-wide.  Output casts back to a plain binary-collation string so
    downstream consumers see a stable type."""
    p = load_tables(spark, sf_dir)["part"]
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.col("p_type"))
        .alias("type_mixed"),
        "p_retailprice",
    )
    return (
        mixed.groupBy(F.expr("type_mixed COLLATE UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("p_type_ci"),
            "n_parts",
            "total_price",
        )
        .orderBy("p_type_ci")
    )
