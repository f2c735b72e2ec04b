"""Composite analytics queries (TPC-H-shaped) + scale patterns.

These exercise multi-join + agg + sort pipelines end-to-end (the shapes the
fixture star schema exists for) and document the 100 TB skew playbook as
runnable, oracle-checked code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import bcount, davg_sql, dsum, dsum_sql
from ..plans import release_with
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


@query(
    "q_comp_forecast_revenue",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    group="B",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global agg. The
    whole predicate pushes into the parquet scan (PushedFilters) and only 3
    columns are read — the canonical 'scan efficiency' probe at 100 TB."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dsum("l_extendedprice * l_discount").alias("revenue"))


@query(
    "q_comp_volume_shipping",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    group="B",
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of the same dim (supplier nation vs customer
    nation) + a disjunctive cross-role predicate + per-year agg. Both nation
    sides broadcast; the fact tables shuffle once on orderkey."""
    t = load_tables(spark, sf_dir)
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_comp_market_share",
    oracle=f"""
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n_name = 'NATION_3'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY o_year ORDER BY o_year
""",
    group="B",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional share-of-total per year — the CASE-sum /
    sum division pattern with exact decimal accumulation on both engines."""
    t = load_tables(spark, sf_dir)
    rev = F.expr("l_extendedprice * (1 - l_discount)").cast("decimal(18,6)")
    nat_rev = F.when(F.col("n_name") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_comp_top_customers",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dsum_sql('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 170
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
    group="B",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered agg feeding the customer join.
    Lineitem is aggregated ONCE to per-order totals (each lineitem row joins
    exactly one order, so the per-(customer, order) group total IS the
    per-order total — one shuffle on orderkey instead of the textbook
    semi-join's two), then only qualifying orders join the dims."""
    t = load_tables(spark, sf_dir)
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qdec"))
        .filter(F.col("qdec") > 170)
        .select("l_orderkey", F.col("qdec").cast("double").alias("total_qty"))
    )
    return (
        per_order.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "q_comp_idle_rich_customers",
    oracle=f"""
SELECT SUBSTR(c_name, 1, 9) AS name_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       {dsum_sql('c_acctbal')} AS total_bal
FROM customer
WHERE c_acctbal > (SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY name_prefix ORDER BY name_prefix
""",
    group="B",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join + agg. The
    scalar is one broadcast value; the anti join broadcasts the distinct
    urgent-order custkey set (small relative to lineitem at any SF). The
    average uses the exact-decimal path so the > threshold cut is
    bit-identical across engines (a double-ulp flip here would change
    membership, not a digit).

    The anti side is "no URGENT order" (not "no orders at all"): every
    fixture customer has orders, so the unfiltered form was 0 rows at
    every SF — a vacuous green that proved only schema."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("c_acctbal")
            ).alias("v")
        )
    )
    rich = t["customer"].join(
        F.broadcast(avg_bal), F.col("c_acctbal") > F.col("v")
    )
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        rich.join(
            urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(bcount().alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("name_prefix")
    )


# -- pretraining-pipeline composite ---------------------------------------

PIPE_LANG_DROP = "zh"  # stand-in for "not in the training language set"
PIPE_MIN_TOK = 20
PIPE_MAX_TOK = 95
PIPE_CHUNK_MAX = 0.5
PIPE_CONTAM_MIN = 4  # distinct shared trigrams with any one benchmark doc


def _pretrain_oracle() -> str:
    from ..functions.dedup import _JACCARD_THRESHOLD, _SIG_SQL

    return f"""
WITH docs AS (
  SELECT doc_id, source, lang, STRING_SPLIT(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
         LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(toks) - 2, 0)),
             i -> CONCAT_WS(' ', toks[i], toks[i + 1], toks[i + 2]))) AS shingles
  FROM docs WHERE LEN(toks) >= 3
), sig AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM sh
), buckets AS (
  SELECT doc_id, b.band,
         MD5(CONCAT(sig[2 * b.band + 1], sig[2 * b.band + 2])) AS band_hash
  FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, x.doc_id AS doc_b
  FROM buckets a JOIN buckets x
    ON a.band = x.band AND a.band_hash = x.band_hash AND a.doc_id < x.doc_id
), removed AS (
  SELECT DISTINCT c.doc_b AS doc_id
  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
  WHERE CAST(LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) AS DOUBLE)
        / (LEN(sa.shingles) + LEN(sb.shingles)
           - LEN(LIST_INTERSECT(sa.shingles, sb.shingles))) >= {_JACCARD_THRESHOLD}
), ch AS (
  SELECT doc_id,
         MD5(CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                            toks[i+4], toks[i+5], toks[i+6], toks[i+7])) AS chash
  FROM docs, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 7, 0), 4)) AS t(i)
  WHERE LEN(toks) >= 8
), cstat AS (
  SELECT chash, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chash
), chunkfrac AS (
  SELECT c.doc_id,
         ROUND(CAST(COUNT(*) FILTER (s.nd > 1) AS DOUBLE) / COUNT(*), 6)
             AS shared_frac
  FROM ch c JOIN cstat s USING (chash) GROUP BY c.doc_id
), rep AS (
  SELECT doc_id,
         CAST(LEN(gs) - LEN(LIST_DISTINCT(gs)) AS DOUBLE) / LEN(gs) AS dup_frac
  FROM (SELECT doc_id,
               LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(toks) - 2, 0)),
                   i -> CONCAT_WS(' ', toks[i], toks[i + 1], toks[i + 2])) AS gs
        FROM docs WHERE LEN(toks) >= 3)
), ex AS (
  SELECT doc_id, UNNEST(shingles) AS g FROM sh
), bench AS (
  SELECT doc_id, g FROM ex WHERE doc_id % 97 = 0
), contam AS (
  SELECT doc_id, MAX(ns) AS contam_max
  FROM (SELECT c.doc_id, b.doc_id AS bd, COUNT(*) AS ns
        FROM ex c JOIN bench b ON c.g = b.g AND c.doc_id <> b.doc_id
        GROUP BY c.doc_id, b.doc_id)
  GROUP BY doc_id
), feat AS (
  SELECT d.doc_id, d.source, d.lang, CAST(LEN(d.toks) AS BIGINT) AS n_tokens,
         COALESCE(r.dup_frac, 0) AS dup_frac,
         COALESCE(cf.shared_frac, 0) AS shared_frac,
         (rm.doc_id IS NOT NULL) AS is_near_dup,
         COALESCE(cm.contam_max, 0) AS contam_max,
         (d.doc_id % 97 = 0) AS is_holdout
  FROM docs d
  LEFT JOIN rep r USING (doc_id)
  LEFT JOIN chunkfrac cf USING (doc_id)
  LEFT JOIN removed rm USING (doc_id)
  LEFT JOIN contam cm USING (doc_id)
)
SELECT doc_id, source, lang, n_tokens,
       (lang <> '{PIPE_LANG_DROP}'
        AND n_tokens BETWEEN {PIPE_MIN_TOK} AND {PIPE_MAX_TOK}
        AND dup_frac = 0 AND shared_frac <= {PIPE_CHUNK_MAX}
        AND NOT is_near_dup AND contam_max < {PIPE_CONTAM_MIN}
        AND NOT is_holdout) AS kept,
       CONCAT_WS(',',
         CASE WHEN lang = '{PIPE_LANG_DROP}' THEN 'lang' END,
         CASE WHEN n_tokens NOT BETWEEN {PIPE_MIN_TOK} AND {PIPE_MAX_TOK} THEN 'len' END,
         CASE WHEN dup_frac > 0 THEN 'rep' END,
         CASE WHEN shared_frac > {PIPE_CHUNK_MAX} THEN 'chunk_dup' END,
         CASE WHEN is_near_dup THEN 'near_dup' END,
         CASE WHEN contam_max >= {PIPE_CONTAM_MIN} THEN 'contam' END,
         CASE WHEN is_holdout THEN 'holdout' END) AS reasons
FROM feat
ORDER BY doc_id
"""


@query("q_comp_pretrain_pipeline", oracle=_pretrain_oracle(), group="E")
def pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E: the end-to-end pretraining-data curation composite — every gate a
    real pipeline runs before training, fused into ONE declarative plan
    with a per-document keep/drop decision and the failed-gate reasons:

      lang filter | token-length band | trigram-repetition (Gopher-style)
      | chunk-level duplication | MinHash-LSH near-dup removal | benchmark
      n-gram contamination | holdout exclusion

    Composes the already-oracle-checked operators (chunk_dedup,
    minhash_lsh, contamination) rather than re-deriving them, so every
    gate's scale shape carries over: all joins are on doc_id (uniform
    key), the LSH band join moves ids only, the benchmark side is
    broadcast, and nothing is ever pairwise across the corpus.  The
    reasons string is CONCAT_WS over per-gate CASEs — null-skipping in
    both engines, so kept docs get ''."""
    from ..functions.dedup import chunk_dedup, minhash_lsh
    from ..functions.text import contamination

    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split("text", " ")
    gs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("toks") - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    base = d.select(
        "doc_id",
        "source",
        "lang",
        toks.alias("toks"),
    ).select(
        "doc_id",
        "source",
        "lang",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.when(
            F.size("toks") >= 3,
            (F.size(gs) - F.size(F.array_distinct(gs))).cast("double") / F.size(gs),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
    chunkfrac = chunk_dedup(spark, sf_dir).select("doc_id", "shared_frac")
    removed = (
        minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    contam = (
        contamination(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.max("n_shared").alias("contam_max"))
    )
    feat = (
        base.join(chunkfrac, "doc_id", "left")
        .join(removed, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "dup_frac",
            F.coalesce("shared_frac", F.lit(0.0)).alias("shared_frac"),
            F.coalesce("is_near_dup", F.lit(False)).alias("is_near_dup"),
            F.coalesce("contam_max", F.lit(0)).alias("contam_max"),
            (F.col("doc_id") % 97 == 0).alias("is_holdout"),
        )
    )
    kept = (
        (F.col("lang") != PIPE_LANG_DROP)
        & F.col("n_tokens").between(PIPE_MIN_TOK, PIPE_MAX_TOK)
        & (F.col("dup_frac") == 0)
        & (F.col("shared_frac") <= PIPE_CHUNK_MAX)
        & ~F.col("is_near_dup")
        & (F.col("contam_max") < PIPE_CONTAM_MIN)
        & ~F.col("is_holdout")
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("lang") == PIPE_LANG_DROP, F.lit("lang")),
        F.when(~F.col("n_tokens").between(PIPE_MIN_TOK, PIPE_MAX_TOK), F.lit("len")),
        F.when(F.col("dup_frac") > 0, F.lit("rep")),
        F.when(F.col("shared_frac") > PIPE_CHUNK_MAX, F.lit("chunk_dup")),
        F.when(F.col("is_near_dup"), F.lit("near_dup")),
        F.when(F.col("contam_max") >= PIPE_CONTAM_MIN, F.lit("contam")),
        F.when(F.col("is_holdout"), F.lit("holdout")),
    )
    return feat.select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        kept.alias("kept"),
        reasons.alias("reasons"),
    ).orderBy("doc_id")


@query(
    "q_ext_range_join",
    oracle="""
SELECT e.event_id, CAST(COUNT(c.event_id) AS BIGINT) AS clicks_before
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND c.ts >= e.ts - INTERVAL 10 MINUTE
 AND c.ts <  e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id ORDER BY e.event_id
""",
    group="B",
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for every error event, count same-user clicks
    in the preceding 10 minutes. Scale shape: the equi-key (user_id) carries
    the shuffle; the range predicate evaluates inside the joined partition,
    so this stays a hash join — never a cartesian. At 100 TB you'd add a
    coarse time-bucket to the equi-key to bound per-key fan-in."""
    ev = load_tables(spark, sf_dir)["events"]
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("u"), F.col("ts").alias("ets")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    return (
        err.join(
            clk,
            (F.col("cu") == F.col("u"))
            & (F.col("cts") >= F.col("ets") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") < F.col("ets")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("click_id").cast("bigint").alias("clicks_before"))
        .orderBy("event_id")
    )


@query(
    "q_ext_hypertable_rollup",
    oracle=f"""
SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('value')} AS total_value
FROM events
GROUP BY ROLLUP(day, hour, event_type)
ORDER BY day NULLS FIRST, hour NULLS FIRST, event_type NULLS FIRST
""",
    group="B",
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass over the event
    stream produces the hour, day, and grand-total layers (GROUP BY ROLLUP
    over the time hierarchy). At scale this is the materialized-rollup
    pattern: partial aggregation is map-side, and the rollup layers reuse
    the finest layer's shuffle."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
            "value",
        )
        .rollup("day", "hour", "event_type")
        .agg(bcount().alias("n"), dsum("value").alias("total_value"))
        .orderBy(
            F.col("day").asc_nulls_first(),
            F.col("hour").asc_nulls_first(),
            F.col("event_type").asc_nulls_first(),
        )
    )


@query(
    "q_ext_stats_agg",
    oracle="""
WITH mo AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND(SQRT((sxx - sx * sx / n) / n), 6) AS qty_stddev_pop,
       ROUND((sxy - sx * sy / n) / n, 6) AS covar_pop,
       ROUND((sxy - sx * sy / n)
             / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 6) AS corr_qp
FROM mo ORDER BY l_returnflag
""",
    group="B",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/covar/corr) computed from exact
    decimal moment sums. Built-in corr()/stddev() accumulate doubles in
    partition order — nondeterministic across partitionings and engines;
    the moment sums are exact decimals (one shuffle, same cost) and the
    final double combination is the SAME IEEE expression both sides, so the
    result is bit-stable at any parallelism. The per-row squares stay well
    inside DECIMAL(38,6)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    d = "decimal(38,6)"
    mo = li.groupBy("l_returnflag").agg(
        bcount().alias("n"),
        F.sum(F.col("l_quantity").cast(d)).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast(d)).cast("double").alias("sy"),
        F.sum(F.expr("l_quantity * l_quantity").cast(d)).cast("double").alias("sxx"),
        F.sum(F.expr("l_extendedprice * l_extendedprice").cast(d)).cast("double").alias("syy"),
        F.sum(F.expr("l_quantity * l_extendedprice").cast(d)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return mo.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt((sxx - sx * sx / n) / n), 6).alias("qty_stddev_pop"),
        F.round((sxy - sx * sy / n) / n, 6).alias("covar_pop"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            6,
        ).alias("corr_qp"),
    ).orderBy("l_returnflag")


@query(
    "q_ext_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS q50,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS q75,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    group="B",
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile() == DuckDB
    quantile_cont, both linear-interpolation on the sorted set — a
    rank-based computation, so no accumulation-order drift). The scale
    path for approximate needs is approx_percentile/t-digest (see
    q_b13_approx_count_distinct for the sketch-family pattern)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("q50"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("price_p90"),
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


@query(
    "q_ext_listagg",
    oracle="""
SELECT r_name,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
    group="B",
)
def listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string/list aggregation. collect_list is partition-order
    nondeterministic by itself — sort_array before joining makes the result
    layout-independent, mirroring DuckDB's STRING_AGG(... ORDER BY)."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            bcount().alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "q_b14_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    group="B",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 (cont.): explicit GROUPING SETS with grouping() markers — the
    general form rollup/cube specialize. Runs through spark.sql so the text
    stays near-identical to the oracle."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "q_ext_dates",
    oracle="""
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS due_date,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr
FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
""",
    group="B",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 (cont.): last_day / date_add / datediff / quarter — the date
    arithmetic surface (mind datediff arg order: Spark (end, start) ==
    DuckDB date_diff('day', start, end))."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
            F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("days_since_epoch_start"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_ext_funnel",
    oracle="""
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS signed_up,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                     THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_signup,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                      AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
FROM stages
""",
    group="B",
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup -> click -> purchase ordered-stage
    conversion via conditional MIN timestamps — one shuffle on user_id,
    one pass, no self-joins (the n-way event self-join formulation
    explodes at scale; conditional aggregation doesn't)."""
    ev = load_tables(spark, sf_dir)["events"]
    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))
    stages = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        bcount().alias("n_users"),
        F.sum(F.when(signed, 1).otherwise(0)).cast("bigint").alias("signed_up"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("bigint").alias("clicked_after_signup"),
        F.sum(F.when(purchased, 1).otherwise(0)).cast("bigint").alias("full_funnel"),
    )


@query(
    "q_ext_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity WHERE week_offset <= 3
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
    group="B",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted per
    week-offset of later activity.  The first-touch timestamp comes from a
    ``min over (partition by user_id)`` WINDOW, not an agg + self-join —
    one events scan and one user_id shuffle instead of two of each (the
    round-4 single-scan rewrite).  The warehouse classic for activity
    data."""
    ev = load_tables(spark, sf_dir)["events"]
    wu = Window.partitionBy("user_id")
    activity = (
        ev.withColumn(
            "cohort_week", F.date_trunc("week", F.min("ts").over(wu))
        )
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week")) / 7
                )
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 3)
        .groupBy("cohort_week", "week_offset")
        .agg(bcount().alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q_ext_histogram",
    oracle="""
SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM events
GROUP BY bucket ORDER BY bucket
""",
    group="B",
)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-bucketing — a one-shuffle GROUP BY
    (width_bucket semantics without engine-specific edge rules)."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.floor(F.col("value") / 25.0).cast("bigint").alias("bucket"))
        .agg(
            bcount().alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q_ext_salted_join",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {dsum_sql('l_extendedprice')} AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    group="B",
)
def salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew playbook, join half (companion to q_ext_salted_agg): when one
    join key is pathologically hot, salt the FACT side's key with a
    deterministic per-row component and replicate the other side once per
    salt — every hot key spreads over N_SALTS reducers, at the cost of an
    N_SALTS-times-larger build side. Identical results to the plain join
    (the oracle IS the plain join). AQE's skew-join split is the automatic
    version; the explicit form is for engines/pipelines where AQE can't see
    the skew (e.g. a skewed key feeding a window)."""
    n_salts = 8
    t = load_tables(spark, sf_dir)
    fact = t["lineitem"].withColumn(
        "f_salt", (F.col("l_linenumber") % n_salts).cast("int")
    )
    dim = t["orders"].withColumn(
        "d_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        fact.join(
            dim,
            (F.col("f_salt") == F.col("d_salt"))
            & (F.col("l_orderkey") == F.col("o_orderkey")),
        )
        .groupBy("o_orderpriority")
        .agg(bcount().alias("n_items"), dsum("l_extendedprice").alias("total_price"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_ext_gapfill_locf",
    oracle="""
WITH d AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
), s AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM d GROUP BY user_id
), cal AS (
  SELECT user_id, UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 DAY)) AS day
  FROM s
), j AS (
  SELECT c.user_id, c.day, d.day_value
  FROM cal c LEFT JOIN d ON c.user_id = d.user_id AND c.day = d.day
)
SELECT user_id, CAST(day AS DATE) AS day,
       ROUND(day_value, 2) AS observed_value,
       ROUND(LAST_VALUE(day_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled_value,
       (day_value IS NOT NULL) AS is_observed
FROM j ORDER BY user_id, day
""",
    group="E",
)
def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): time-series gap-fill + last-observation-carried-forward —
    the timescaledb `time_bucket_gapfill` / `locf` shape: per-user daily
    calendar densified over each user's own active span, missing days
    carried forward from the last observed day.

    Scale shape: the calendar explode is per-key and bounded (span days),
    the LEFT JOIN is an equi-join on (user_id, day) — uniform key — and the
    LOCF window is partitioned per user (no global window).  Day sums take
    the decimal parity path so fill values are partition-order exact."""
    ev = load_tables(spark, sf_dir)["events"]
    d = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(dsum("value").alias("day_value"))
    )
    s = d.groupBy("user_id").agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    cal = s.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    j = cal.join(d, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        F.col("day").cast("date").alias("day"),
        F.round("day_value", 2).alias("observed_value"),
        F.round(F.last("day_value", ignorenulls=True).over(w), 2).alias(
            "filled_value"
        ),
        F.col("day_value").isNotNull().alias("is_observed"),
    ).orderBy("user_id", "day")


def _morton_sql(xe: str, ye: str, bits: int = 8) -> str:
    """Bit-interleave SQL for two small ints -> Morton/Z key.  The SAME
    generated arithmetic feeds the Spark expression and the DuckDB oracle,
    so cross-engine equality is by construction."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_Z_X = "(o_custkey % 256)"
_Z_Y = "(CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) % 256)"
_Z_Y_SPARK = "(CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) % 256)"


@query(
    "q_ext_zorder_layout",
    oracle=f"""
WITH z AS (
  SELECT o_orderkey, {_Z_X} AS xk, {_Z_Y} AS yk,
         {_morton_sql(_Z_X, _Z_Y)} AS zkey
  FROM orders
)
SELECT CAST(zkey >> 8 AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(xk) AS BIGINT) AS min_x, CAST(MAX(xk) AS BIGINT) AS max_x,
       CAST(MIN(yk) AS BIGINT) AS min_y, CAST(MAX(yk) AS BIGINT) AS max_y
FROM z GROUP BY zkey >> 8 ORDER BY zbucket
""",
    group="E",
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): Z-order (Morton) clustering key over two dimensions of
    ``orders`` — the Delta/Iceberg OPTIMIZE ZORDER layout primitive.  The
    report groups rows by Z-bucket (zkey >> 8) and shows each bucket's
    min/max in BOTH dimensions: every bucket is a 16x16 tile, so a
    range-partitioned write on zkey gives files whose footer min/max prune
    on EITHER dimension's predicate (the property pytest asserts).

    At 100 TB this is the sort key you hand to the range-sorted writer
    (sources/writers.py): one global range shuffle at write time buys
    multi-dimensional file skipping on every later scan — no index
    structure, just layout.  Pure integer arithmetic, map-side except the
    one aggregation."""
    o = load_tables(spark, sf_dir)["orders"]
    zexpr = _morton_sql(_Z_X, _Z_Y_SPARK)
    z = o.selectExpr(
        "o_orderkey",
        f"{_Z_X} AS xk",
        f"{_Z_Y_SPARK} AS yk",
        f"{zexpr} AS zkey",
    )
    return (
        z.groupBy(F.shiftright("zkey", 8).cast("bigint").alias("zbucket"))
        .agg(
            bcount().alias("n_rows"),
            F.min("xk").cast("bigint").alias("min_x"),
            F.max("xk").cast("bigint").alias("max_x"),
            F.min("yk").cast("bigint").alias("min_y"),
            F.max("yk").cast("bigint").alias("max_y"),
        )
        .orderBy("zbucket")
    )


@query(
    "q_ext_upsert_scd1",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
), upd AS (
  SELECT o_orderkey, FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS new_price
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
       COALESCE(u.new_price, b.o_totalprice) AS price,
       CASE WHEN u.o_orderkey IS NULL THEN 'kept'
            WHEN b.o_orderkey IS NULL THEN 'inserted'
            ELSE 'updated' END AS change
FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
ORDER BY o_orderkey
""",
    group="E",
)
def upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): MERGE INTO semantics (SCD type 1) in plain DataFrame ops —
    a CDC batch applied onto a warehouse state: matched keys take the new
    value, unmatched CDC keys insert, untouched base rows persist.  The
    full-outer equi-join on the key is the engine-agnostic MERGE shape;
    Delta/Iceberg MERGE compiles to exactly this join plus file rewrite.

    At 100 TB: both sides shuffle once on the (uniform) key — or zero
    shuffle when base and CDC are bucketed on it (sources/writers.py
    bucketed layout); AQE handles the CDC side being orders of magnitude
    smaller (broadcast if it fits).

    Rounding parity: the 2-dec price is ``floor(x*100 + 0.5)/100`` on BOTH
    engines (IEEE-identical), never ROUND — Spark's ROUND goes through
    BigDecimal.valueOf (shortest decimal repr, HALF_UP) while DuckDB rounds
    the raw binary double; they disagree one cent on half-way doubles (8
    rows at sf0.01)."""
    o = load_tables(spark, sf_dir)["orders"]
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    upd = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("u_orderkey"),
            (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias(
                "new_price"
            ),
        )
    )
    j = base.join(upd, base["o_orderkey"] == upd["u_orderkey"], "full")
    return (
        j.select(
            F.coalesce("o_orderkey", "u_orderkey").alias("o_orderkey"),
            F.coalesce("new_price", "o_totalprice").alias("price"),
            F.when(F.col("u_orderkey").isNull(), "kept")
            .when(F.col("o_orderkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("change"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_comp_dataset_card",
    oracle="""
WITH t AS (
  SELECT COUNT(*) AS n_docs,
         SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS DECIMAL(18,6))) AS n_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT source) AS n_sources,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
         COUNT(DISTINCT MD5(text)) AS n_unique
  FROM documents
)
SELECT metric, ROUND(value, 6) AS value FROM (
  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM t
  UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM t
  UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM t
  UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM t
  UNION ALL SELECT 'en_frac', CAST(n_en AS DOUBLE) / n_docs FROM t
  UNION ALL SELECT 'exact_dup_rate', 1.0 - CAST(n_unique AS DOUBLE) / n_docs FROM t
  UNION ALL SELECT 'mean_doc_tokens', CAST(n_tokens AS DOUBLE) / n_docs FROM t
) ORDER BY metric
""",
    group="E",
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): the DATASET CARD — the datasheet summary a training corpus
    ships with (docs, tokens, language/source spread, duplication) as one
    tidy (metric, value) table.

    Plan shape: ONE aggregation pass over the corpus computes every
    ingredient (count, decimal token sum, distincts, conditional counts);
    the seven card rows then project from that single-row result — the
    per-metric UNION is over 1-row locals, never re-scanning the corpus.
    At 100 TB the only heavy operators are the two count-distincts, which
    Spark executes as partial-agg expand (or swap in approx_count_distinct
    when exactness isn't contractual)."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("decimal(18,6)")).alias("n_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.count_distinct(F.md5("text")).alias("n_unique"),
    )
    nd = F.col("n_docs").cast("double")
    rows = [
        ("n_docs", nd),
        ("n_tokens", F.col("n_tokens").cast("double")),
        ("n_langs", F.col("n_langs").cast("double")),
        ("n_sources", F.col("n_sources").cast("double")),
        ("en_frac", F.col("n_en").cast("double") / F.col("n_docs")),
        ("exact_dup_rate", F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs")),
        ("mean_doc_tokens", F.col("n_tokens").cast("double") / F.col("n_docs")),
    ]
    out = None
    for name, expr in rows:
        piece = t.select(F.lit(name).alias("metric"), F.round(expr, 6).alias("value"))
        out = piece if out is None else out.unionAll(piece)
    return out.orderBy("metric")


@query(
    "q_ext_upsert_scd2",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
), upd AS (
  SELECT o_orderkey, FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS new_price
  FROM orders WHERE o_orderkey % 3 = 0
), old_rows AS (
  SELECT b.o_orderkey, b.o_totalprice AS price,
         '2020-01-01' AS valid_from,
         CASE WHEN u.o_orderkey IS NULL THEN '9999-12-31' ELSE '2024-01-01' END
             AS valid_to,
         (u.o_orderkey IS NULL) AS is_current,
         CAST(1 AS BIGINT) AS version
  FROM base b LEFT JOIN upd u ON b.o_orderkey = u.o_orderkey
), new_rows AS (
  SELECT u.o_orderkey, u.new_price AS price,
         '2024-01-01' AS valid_from, '9999-12-31' AS valid_to,
         TRUE AS is_current,
         CAST(CASE WHEN b.o_orderkey IS NULL THEN 1 ELSE 2 END AS BIGINT)
             AS version
  FROM upd u LEFT JOIN base b ON u.o_orderkey = b.o_orderkey
)
SELECT * FROM (
  SELECT * FROM old_rows UNION ALL SELECT * FROM new_rows
) ORDER BY o_orderkey, version
""",
    group="E",
)
def upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): MERGE with SCD TYPE-2 semantics — history-preserving CDC:
    matched keys CLOSE the old row (valid_to = effective date) and append
    a new current version; unmatched CDC keys insert as version 1;
    untouched base rows stay open.  The complement of q_ext_upsert_scd1
    (which overwrites) — together they cover both warehouse merge modes.

    Plan: ONE key-equi join evaluated from both sides (base-left for row
    closing, cdc-left for versioning) + UNION ALL — Spark reuses the
    shuffle-ready sides; at 100 TB both joins broadcast the CDC batch or
    ride bucketed layouts, and the union is append-only (the Delta/Iceberg
    MERGE file-rewrite shape).  Open rows carry the 9999-12-31 sentinel,
    not NULL, so partition pruning on valid_to stays sargable."""
    o = load_tables(spark, sf_dir)["orders"]
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("u_orderkey"),
        (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias("new_price"),
    )
    old_rows = (
        base.join(upd, base["o_orderkey"] == upd["u_orderkey"], "left")
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.lit("2020-01-01").alias("valid_from"),
            F.when(F.col("u_orderkey").isNull(), "9999-12-31")
            .otherwise("2024-01-01")
            .alias("valid_to"),
            F.col("u_orderkey").isNull().alias("is_current"),
            F.lit(1).cast("bigint").alias("version"),
        )
    )
    new_rows = (
        upd.join(base, upd["u_orderkey"] == base["o_orderkey"], "left")
        .select(
            F.col("u_orderkey").alias("o_orderkey"),
            F.col("new_price").alias("price"),
            F.lit("2024-01-01").alias("valid_from"),
            F.lit("9999-12-31").alias("valid_to"),
            F.lit(True).alias("is_current"),
            F.when(F.col("o_orderkey").isNull(), 1)
            .otherwise(2)
            .cast("bigint")
            .alias("version"),
        )
    )
    return old_rows.unionAll(new_rows).orderBy("o_orderkey", "version")


@query(
    "q_comp_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    group="B",
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers BY how many (non-urgent) orders they
    placed — the outer-join-then-histogram double aggregation.  The LEFT
    join keeps zero-order customers (the c_count = 0 bucket TPC-H exists
    to test); the join predicate filters orders INSIDE the join, not
    after it (a WHERE would silently turn the outer join inner).

    At 100 TB: one custkey shuffle for the join+first agg (orders side
    filtered before the exchange), then the histogram agg's input is one
    row per customer — and the second groupBy key (c_count) is tiny, so
    the final agg broadcasts down to nothing."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(bcount().alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_comp_promo_revenue",
    oracle=f"""
SELECT FLOOR(100.00 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
       / {dsum_sql('l_extendedprice * (1 - l_discount)')} * 1e6 + 0.5) / 1e6 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
    group="B",
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregation as a
    RATIO in one pass (no self-join, no two queries): both the PROMO
    numerator and the total denominator come from the same scan+join.
    The date filter pushes to the lineitem scan; part broadcasts.
    Decimal discipline on both sums keeps the ratio cross-engine exact."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo.cast("decimal(18,6)")).cast("double").alias("pnum"),
            F.sum(rev.cast("decimal(18,6)")).cast("double").alias("pden"),
        )
        .select(
            (
                F.floor(F.lit(100.00) * F.col("pnum") / F.col("pden") * 1e6 + 0.5)
                / 1e6
            ).alias("promo_pct")
        )
    )


@query(
    "q_comp_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS min_unit
  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(min_unit) AS best_unit FROM unit GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand, u.l_suppkey AS s_suppkey,
       FLOOR(u.min_unit * 1e6 + 0.5) / 1e6 AS unit_price
FROM unit u
JOIN best b ON u.l_partkey = b.l_partkey AND u.min_unit = b.best_unit
JOIN part p ON p.p_partkey = u.l_partkey
WHERE p.p_size < 15
QUALIFY ROW_NUMBER() OVER (PARTITION BY p.p_partkey ORDER BY u.l_suppkey) = 1
ORDER BY p.p_partkey
""",
    group="B",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the fixture has no partsupp, so unit price
    observed in lineitem plays supply cost): for each small part, the
    supplier offering the minimum unit price — the correlated-min pattern
    decorrelated into agg + join-back-on-equality (what Catalyst itself
    does to a correlated scalar subquery), with a deterministic lowest-
    suppkey tie-break.

    At 100 TB: two hash-aggs on (partkey, suppkey) then partkey — both
    map-side combined — and an equi-join back on (partkey, min); the
    selective p_size filter prunes before the final join.  No window over
    corpus-sized data: the tie-break window runs on one-row-per-(part,
    supplier) minima, already reduced."""
    t = load_tables(spark, sf_dir)
    unit = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit"))
    )
    best = unit.groupBy("l_partkey").agg(F.min("min_unit").alias("best_unit"))
    w = Window.partitionBy("p_partkey").orderBy("l_suppkey")
    return (
        unit.join(
            best,
            (unit["l_partkey"] == best["l_partkey"])
            & (unit["min_unit"] == best["best_unit"]),
        )
        .drop(best["l_partkey"])
        .join(
            F.broadcast(t["part"].filter(F.col("p_size") < 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("s_suppkey"),
            (F.floor(F.col("min_unit") * 1e6 + 0.5) / 1e6).alias("unit_price"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_comp_important_brands",
    oracle=f"""
WITH brand_rev AS (
  SELECT p_brand, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, revenue FROM brand_rev
WHERE revenue > (SELECT SUM(revenue) FROM brand_rev) * 0.04
ORDER BY revenue DESC, p_brand
""",
    group="B",
)
def important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: a HAVING whose threshold is a GLOBAL scalar over
    the same aggregate (brands above 4% of total revenue) — the
    fraction-of-total pattern.  The aggregate computes once; the scalar
    total re-aggregates the (tiny) per-brand result and broadcasts back
    as a literal-like single row, so the corpus is scanned exactly once.
    Decimal sums keep both the per-brand values and their total exact, so
    the float threshold compare is cross-engine identical.

    The scalar total comes from a global window OVER THE AGGREGATE (25
    brand rows — the single-partition window is over model-sized data by
    construction), not from re-aggregating the source: re-using
    ``brand_rev`` in a second branch would make Spark scan and join the
    corpus twice (DataFrames are plans, not materialized results).  The
    plan test asserts exactly one lineitem scan."""
    t = load_tables(spark, sf_dir)
    brand_rev = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
    )
    w = Window.partitionBy(F.lit(1))
    return (
        brand_rev.withColumn("total", F.sum("revenue").over(w))
        .filter(F.col("revenue") > F.col("total") * 0.04)
        .select("p_brand", "revenue")
        .orderBy(F.col("revenue").desc(), "p_brand")
    )


@query(
    "q_comp_dq_report",
    oracle="""
SELECT check_name, n_violations FROM (
  SELECT 'orders_orphan_customer' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_violations
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
  UNION ALL
  SELECT 'lineitem_nonpositive_qty',
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem WHERE l_quantity <= 0
  UNION ALL
  SELECT 'lineitem_discount_range',
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem WHERE l_discount < 0 OR l_discount > 1
  UNION ALL
  SELECT 'documents_empty_text',
         CAST(COUNT(*) AS BIGINT)
  FROM documents WHERE text IS NULL OR LENGTH(text) = 0
  UNION ALL
  SELECT 'documents_dup_ids',
         CAST(COUNT(*) AS BIGINT)
  FROM (SELECT doc_id FROM documents GROUP BY doc_id HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'events_null_user',
         CAST(COUNT(*) AS BIGINT)
  FROM events WHERE user_id IS NULL
) ORDER BY check_name
""",
    group="E",
)
def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): the data-quality constraint suite every warehouse runs
    before publishing a table (dbt tests / Deequ checks as one query):
    referential integrity (orders -> customer orphans via anti-join),
    domain ranges (quantity, discount), non-emptiness, key uniqueness,
    NOT NULL — one (check, n_violations) row each.

    Plan: each check is an independent scan+filter+count (the orphan check
    is a broadcast anti-join; the uniqueness check a keyed agg) unioned at
    the END — checks are scalar aggregates, so the union moves six rows.
    At 100 TB you run exactly this shape per table per load, and any
    check can be partition-scoped (WHERE load_date = ...) for free
    because the filter sits directly over the scan."""
    return _dq_checks(load_tables(spark, sf_dir))


def _dq_checks(t: dict) -> DataFrame:
    """The constraint battery over any {name: DataFrame} table set —
    separated from the fixture loader so tests can prove every check FIRES
    on corrupted tables (the fixtures are clean; an all-zero report alone
    would be vacuous evidence the checks work)."""
    one = F.count(F.lit(1)).cast("bigint").alias("n_violations")

    def row(name, df):
        return df.agg(one).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    orphans = t["orders"].join(
        F.broadcast(t["customer"].select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    )
    dup_ids = (
        t["documents"].groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    checks = [
        ("orders_orphan_customer", orphans),
        ("lineitem_nonpositive_qty", t["lineitem"].filter(F.col("l_quantity") <= 0)),
        (
            "lineitem_discount_range",
            t["lineitem"].filter(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ),
        ),
        (
            "documents_empty_text",
            t["documents"].filter(
                F.col("text").isNull() | (F.length("text") == 0)
            ),
        ),
        ("documents_dup_ids", dup_ids),
        ("events_null_user", t["events"].filter(F.col("user_id").isNull())),
    ]
    out = None
    for name, df in checks:
        piece = row(name, df)
        out = piece if out is None else out.unionAll(piece)
    return out.orderBy("check_name")


_LN2 = "0.6931471805599453"
_DECAY_HALFLIFE_DAYS = 7.0


@query(
    "q_ext_decayed_engagement",
    oracle=f"""
WITH ref AS (
  SELECT MAX(CAST(ts AS TIMESTAMP)) AS ref_ts FROM events
), wtd AS (
  SELECT user_id,
         value * EXP(-{_LN2} * (EPOCH(ref.ref_ts) - EPOCH(CAST(ts AS TIMESTAMP)))
                     / 86400.0 / {_DECAY_HALFLIFE_DAYS}) AS wv,
         value
  FROM events CROSS JOIN ref
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(wv AS DECIMAL(18,6))) AS DOUBLE) AS decayed_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS raw_value
FROM wtd GROUP BY user_id ORDER BY user_id
""",
    group="E",
)
def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): exponentially time-decayed engagement score — recency
    weighting with a 7-day half-life against the corpus's newest event
    (recommendation/ranking freshness, churn scoring).  Next to the raw
    sum so the decay's effect is visible in one row.

    Plan: the reference time is a scalar MAX over ONE timestamp column
    (with parquet aggregate pushdown this is footer statistics, no data
    read); the weight is per-row IEEE math inside codegen; the sums
    quantize to decimal before aggregating so the result is
    partition-order independent.  One uniform user_id shuffle — the decay
    adds zero data movement over a plain per-user rollup.  Cross-engine
    note: EXP agrees between the JVM and DuckDB on these inputs (both
    correctly-rounded libm-style); the decimal quantization then makes
    the aggregation order-proof, and the 3-SF hash-match is the evidence."""
    ev = load_tables(spark, sf_dir)["events"]
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    # cast("double") = fractional epoch seconds, matching DuckDB's EPOCH();
    # unix_timestamp() truncates to whole seconds and diverges
    age_days = (
        F.col("ref_ts").cast("double") - F.col("ts").cast("double")
    ) / 86400.0
    wv = F.col("value") * F.exp(
        F.lit(-0.6931471805599453) * age_days / _DECAY_HALFLIFE_DAYS
    )
    return (
        ev.crossJoin(F.broadcast(ref))
        .select("user_id", wv.alias("wv"), "value")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("wv").cast("decimal(18,6)")).cast("double").alias("decayed_value"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("raw_value"),
        )
        .orderBy("user_id")
    )


N_EQUIDEPTH_BINS = 10


@query(
    "q_ext_equidepth_hist",
    oracle=f"""
WITH bounds AS (
  SELECT QUANTILE_CONT(l_extendedprice,
           [x / {N_EQUIDEPTH_BINS}.0 FOR x IN RANGE(1, {N_EQUIDEPTH_BINS})])
         AS bs
  FROM lineitem
)
SELECT CAST(LEN(LIST_FILTER(bounds.bs, b -> b <= l_extendedprice)) AS BIGINT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {dsum_sql('l_extendedprice')} AS sum_price
FROM lineitem CROSS JOIN bounds
GROUP BY 1 ORDER BY bucket
""",
)
def equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: EQUI-DEPTH histogram (the optimizer-statistics shape) without a
    global sort.  q_ext_histogram is equi-WIDTH (fixed bucket size); the
    equi-depth form needs data-dependent boundaries — the naive plan is
    ntile() over a global ORDER BY, a single-partition scale-killer.

    Scalable form used here: ONE exact-percentile aggregate computes the 9
    interior decile boundaries (partial_agg -> merge, no row shuffle), the
    1-row boundary array broadcasts back, and each row's bucket is a
    map-side expression ``size(filter(bounds, b -> b <= price))``.  Two
    narrow aggregates total; at 100 TB the only data movement is the
    per-bucket rollup.  Boundary floats are bit-identical across engines
    (same order statistics, interpolation strictly interior to adjacent
    2dp data values), so bucket assignment is exact.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    qs = [i / N_EQUIDEPTH_BINS for i in range(1, N_EQUIDEPTH_BINS)]
    bounds = li.agg(
        F.expr(
            "percentile(l_extendedprice, array("
            + ", ".join(str(q) for q in qs)
            + "))"
        ).alias("bs")
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            F.size(
                F.filter("bs", lambda b: b <= F.col("l_extendedprice"))
            ).cast("bigint").alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            bcount().alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("bucket")
    )


@query(
    "q_comp_order_priority_check",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-sliced EXISTS probe counted by priority.  The
    correlated EXISTS decorrelates to a LEFT SEMI join on l_orderkey with
    the extra l_shipdate > o_orderdate predicate riding the equi-key — one
    keyed shuffle; the selective date filter pushes into the orders scan so
    only the slice shuffles."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(bcount().alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_comp_profit_by_nation",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       {dsum_sql("l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity")}
         AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%a%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY nation, o_year
""",
)
def profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-profit rollup by (nation, year).  The fixture
    has no partsupp, so supply cost is proxied as 0.6 · p_retailprice ·
    quantity (same join/agg skeleton).  Plan: part/supplier/nation are
    broadcast dims (the LIKE filter prunes part BEFORE broadcast); the only
    fact-fact shuffle is lineitem ⋈ orders on orderkey.  At 100 TB that one
    keyed exchange dominates — everything else is map-side."""
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    p = t["part"].filter(F.col("p_name").like("%a%")).select("p_partkey", "p_retailprice")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    n = t["nation"].select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q_comp_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
), ranked AS (
  SELECT supplier_no, total_revenue,
         MAX(total_revenue) OVER () AS max_rev
  FROM revenue
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM ranked r JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = r.max_rev
ORDER BY s.s_suppkey
""",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue VIEW + global-max scalar, decorrelated
    as a broadcast SCALAR over the aggregate so the quarter's lineitems are
    scanned ONCE (the textbook form rescans the view to compute max(), and
    a partition-less max window would drag every supplier row through one
    task).  Revenue equality is exact because the measure takes the decimal
    dsum path in both engines."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum("l_extendedprice * (1 - l_discount)").alias("total_revenue")
    ).persist()  # read twice (scalar max + equality probe); released with the
    # result DF by release_with below — never leaks past the query
    # scalar max via agg + broadcast — at 100 TB the per-supplier revenue
    # table is millions of rows; a partition-less max window would drag
    # them all through one task, the broadcast scalar never does
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    ranked = revenue.crossJoin(F.broadcast(max_rev))
    return release_with(
        ranked.filter(F.col("total_revenue") == F.col("max_rev"))
        .join(
            F.broadcast(load_tables(spark, sf_dir)["supplier"]),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey"),
        revenue,
    )


@query(
    "q_comp_parts_supplier_counts",
    oracle="""
WITH assoc AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT a.l_suppkey) AS BIGINT) AS supplier_cnt
FROM assoc a
JOIN part p ON a.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND a.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
LIMIT 20
""",
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group, with a
    NOT IN exclusion list.  The fixture has no partsupp; the part-supplier
    association is recovered as DISTINCT (l_partkey, l_suppkey) from
    lineitem — one narrow distinct shuffle.  The complainy-supplier
    exclusion is a broadcast ANTI join (NOT IN with non-null keys ≡ anti);
    part is a broadcast dim with its filters applied pre-broadcast."""
    t = load_tables(spark, sf_dir)
    assoc = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    return (
        assoc.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@query(
    "q_comp_small_quantity_revenue",
    oracle=f"""
WITH avgq AS (
  SELECT l_partkey, AVG(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
)
SELECT {dsum_sql("l.l_extendedprice")} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#3'
JOIN avgq  ON l.l_partkey = avgq.l_partkey
WHERE l.l_quantity < 0.5 * avgq.aq
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated per-part AVG(quantity) subquery,
    decorrelated into one per-part aggregate joined back on partkey — the
    classic rewrite Spark's optimizer applies to Q17; written explicitly so
    the plan is one lineitem shuffle on l_partkey feeding BOTH the average
    and the probe (co-partitioned join, no second shuffle) plus a broadcast
    of the filtered brand dim.  AVG(integer-valued doubles) is an exact
    sum/count, so the 0.5·avg threshold is bit-identical in both engines."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    avgq = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    p = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        li.join(avgq, "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q_comp_disjunctive_revenue",
    oracle=f"""
SELECT {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 20 AND 35)
""",
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs theta predicate over the join.  The
    optimizer splits the disjunction: the part-only terms (brand ∈ {1,2,3})
    and lineitem-only terms (quantity ∈ [1,35]) are implied disjunction
    envelopes pushed to EACH scan, while the exact OR evaluates post-join —
    so both scans prune even though no single conjunct applies globally.
    part broadcasts; one map-side evaluation, one scalar aggregate."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    p = t["part"]
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 25)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 35)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
            bcount().alias("n_lines"),
        )
    )


IVM_CUTOVER = "1999-01-01"


@query(
    "q_ext_ivm_merge",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: INCREMENTAL VIEW MAINTENANCE — merge a materialized aggregate
    with a delta batch by combining PARTIAL STATES, never rescanning
    history.  The "view" is the priority rollup over orders before
    IVM_CUTOVER; the "delta" is everything after.  Merge = union the two
    partial-state tables and re-aggregate their (count, decimal-sum)
    states — the commutative-monoid property every streaming/IVM engine
    relies on.  The oracle is the FULL recompute, so the hash-match proves
    state-merge ≡ recompute exactly.

    Float discipline: partial sums stay DECIMAL through the merge (decimal
    addition is associative, so split-anywhere == single-pass, bit-exact);
    only the final merged value casts to double.  At 100 TB only the delta
    is scanned: the history side is the stored view state (here recomputed
    from the date slice for the demo, with the cutover filter pushed to
    the scan).
    """
    o = load_tables(spark, sf_dir)["orders"]
    cut = F.lit(IVM_CUTOVER).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            bcount().alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("psum"),
        )

    state = partial(o.filter(F.col("o_orderdate") < cut))
    delta = partial(o.filter(F.col("o_orderdate") >= cut))
    return (
        state.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").cast("bigint").alias("n_orders"),
            F.sum("psum").cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_ext_rolling_zscore",
    oracle="""
WITH scored AS (
  SELECT event_type, value,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS mu,
         CAST(SUM(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS ssq,
         COUNT(*) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT event_type,
         (value - mu) / SQRT((ssq - n * mu * mu) / (n - 1)) AS z
  FROM scored
  WHERE n >= 5 AND (ssq - n * mu * mu) / (n - 1) > 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN ABS(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM z GROUP BY event_type ORDER BY event_type
""",
)
def rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: streaming-style ANOMALY DETECTION — each event's value z-scored
    against that user's trailing 10-event window (strictly preceding, so no
    self-leak), anomalies = |z| > 2 with at least 5 history rows.

    Float discipline: the rolling mean and sum-of-squares go through
    DECIMAL window sums (exact, frame-order-independent), so mu/ssq are
    bit-identical across engines; the z expression is then per-row IEEE.
    Scale shape: one shuffle on user_id; frames are ROWS-bounded so state
    per key is 10 rows — the same bounded-state story as a streaming
    stateful operator, expressed as a batch window."""
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    scored = e.select(
        "event_type",
        "value",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mu"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("ssq"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    var = (F.col("ssq") - F.col("n") * F.col("mu") * F.col("mu")) / (F.col("n") - 1)
    z = (F.col("value") - F.col("mu")) / F.sqrt(var)
    return (
        scored.filter((F.col("n") >= 5) & (var > 0))
        .select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            bcount().alias("n_scored"),
            F.sum(F.when(F.abs(F.col("z")) > 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


@query(
    "q_ext_fuzzy_join",
    oracle="""
WITH pairs AS (
  SELECT a.p_brand,
         LEVENSHTEIN(a.p_name, b.p_name) AS dist
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand
   AND CAST(FLOOR(LENGTH(a.p_name) / 3) AS BIGINT)
       = CAST(FLOOR(LENGTH(b.p_name) / 3) AS BIGINT)
   AND a.p_partkey < b.p_partkey
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_blocked_pairs,
       CAST(SUM(CASE WHEN dist <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_fuzzy_matches
FROM pairs GROUP BY p_brand ORDER BY p_brand
""",
)
def fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: ENTITY-RESOLUTION fuzzy join — candidate pairs blocked on
    (brand, name-length band), then verified with Levenshtein ≤ 2.  The
    blocking turns the quadratic fuzzy match into an equi-join (the same
    never-all-pairs discipline as the D2 near-dup family: cheap blocking
    key first, expensive verifier only inside blocks); length banding is
    sound because edit distance ≥ length difference.

    Scale shape: one equi-join shuffle on (brand, length-band); Levenshtein
    runs post-join inside codegen.  Both engines implement classical edit
    distance, so counts hash-match exactly."""
    p = load_tables(spark, sf_dir)["part"]
    band = F.floor(F.length("p_name") / 3).cast("bigint")
    a = p.select(
        F.col("p_partkey").alias("ka"),
        F.col("p_brand"),
        F.col("p_name").alias("na"),
        band.alias("band"),
    )
    b = p.select(
        F.col("p_partkey").alias("kb"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("nb"),
        band.alias("band"),
    )
    pairs = (
        a.join(
            b,
            (F.col("p_brand") == F.col("brand_b"))
            & (a["band"] == b["band"])
            & (F.col("ka") < F.col("kb")),
        )
        .select("p_brand", F.levenshtein("na", "nb").alias("dist"))
    )
    return (
        pairs.groupBy("p_brand")
        .agg(
            bcount().alias("n_blocked_pairs"),
            F.sum(F.when(F.col("dist") <= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_fuzzy_matches"),
        )
        .orderBy("p_brand")
    )


@query("q_ext_approx_quantile_gauge", oracle=None)
def approx_quantile_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: sketch-accuracy gauge — approx_percentile (Greenwald-Khanna,
    accuracy 1000) vs the exact interpolated percentile at p50/p90/p99,
    with the relative error.  Rows-only by contract (sketch internals are
    engine-specific; the merge result depends on partition layout), but
    tests/test_pipeline_ops.py asserts rel_err < 1% — the bound GK
    guarantees at this accuracy.  At 100 TB the sketch is the only option:
    exact percentile is a full sort-equivalent, GK is one narrow pass."""
    li = load_tables(spark, sf_dir)["lineitem"]
    qs = [0.5, 0.9, 0.99]
    row = li.agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)"
        ).alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("ex"),
    )
    out = row.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("quantile"),
                F.col("ap").cast("array<double>").alias("approx"),
                F.col("ex").alias("exact"),
            )
        ).alias("r")
    ).select(
        F.col("r.quantile").alias("quantile"),
        F.col("r.approx").alias("approx"),
        F.col("r.exact").alias("exact"),
        (F.abs(F.col("r.approx") - F.col("r.exact")) / F.col("r.exact")).alias(
            "rel_err"
        ),
    )
    return out.orderBy("quantile")


K_ANON = 5


@query(
    "q_ext_k_anonymity",
    oracle=f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS sz
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(sz) AS BIGINT) AS k_anonymity,
       CAST(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_below_k,
       CAST(SUM(CASE WHEN sz < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_k
FROM groups
""",
)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: K-ANONYMITY audit — the privacy gate run before a dataset
    release.  Quasi-identifiers here are (nation, market segment); the
    dataset's k-anonymity level is the SMALLEST group size, and rows in
    groups under K_ANON are the re-identification risk that suppression
    or generalization must handle before publishing.

    Scale shape: one hash aggregation on the quasi-identifier tuple, then
    a scalar rollup of the group-size table — the same two-narrow-aggs
    pattern as the histogram ops; nothing is row-expanded."""
    c = load_tables(spark, sf_dir)["customer"]
    groups = c.groupBy("c_nationkey", "c_mktsegment").agg(bcount().alias("sz"))
    return groups.agg(
        bcount().alias("n_groups"),
        F.min("sz").cast("bigint").alias("k_anonymity"),
        F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_k"),
        F.sum(F.when(F.col("sz") < K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_below_k"),
    )


SNAP_T = "2024-03-01 00:00:00"


@query(
    "q_ext_snapshot_asof_read",
    oracle=f"""
WITH hist AS (
  SELECT user_id, value, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn_desc,
         COUNT(*) OVER (PARTITION BY user_id) AS n_versions
  FROM events
  WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '{SNAP_T}'
)
SELECT user_id, value AS value_asof, CAST(n_versions AS BIGINT) AS n_versions
FROM hist WHERE rn_desc = 1
ORDER BY user_id
""",
)
def snapshot_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: POINT-IN-TIME (time-travel) read of a mutable entity — each
    user's latest value as of SNAP_T, plus how many versions led there.
    This is the read half of the SCD2/CDC family (q_ext_upsert_scd2 and
    q_c12 write history; this reconstructs the state any past timestamp
    saw) — the reproducibility primitive for "train on the data as it
    existed on date X".

    Scale shape: the time predicate prunes the scan FIRST (at 100 TB the
    history table is time-partitioned, so this is partition pruning), then
    one shuffle on the entity key and a per-key top-1 — Spark plans the
    rn=1 filter as WindowGroupLimit, a map-side partial top-1."""
    e = load_tables(spark, sf_dir)["events"]
    cut = F.lit(SNAP_T).cast("timestamp")
    h = e.filter(F.col("ts") <= cut)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        h.withColumn("rn_desc", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc).cast("bigint"))
        .filter(F.col("rn_desc") == 1)
        .select("user_id", F.col("value").alias("value_asof"), "n_versions")
        .orderBy("user_id")
    )


_STATS_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount"]


@query(
    "q_ext_analyze_stats",
    oracle="""
SELECT 'l_returnflag' AS col, CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS ndv,
       CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS n_nulls,
       CAST(MIN(l_returnflag) AS VARCHAR) AS min_val,
       CAST(MAX(l_returnflag) AS VARCHAR) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_linestatus', CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_linestatus) AS BIGINT),
       CAST(MIN(l_linestatus) AS VARCHAR), CAST(MAX(l_linestatus) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_quantity', CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
       CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_discount', CAST(COUNT(DISTINCT l_discount) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
       CAST(MIN(l_discount) AS VARCHAR), CAST(MAX(l_discount) AS VARCHAR)
FROM lineitem
ORDER BY col
""",
)
def analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: ANALYZE-style statistics collection — exact NDV / null count /
    min / max per column, the stats table a cost-based optimizer feeds on
    (and the first profiling pass any new dataset gets).

    Plan note: Spark rewrites multiple COUNT(DISTINCT) in one aggregate
    into an Expand (one row per distinct-aggregate per input row) + two
    aggregation phases — all four columns' stats still come from ONE scan
    of the table.  At 100 TB you'd swap exact NDV for HLL
    (approx_count_distinct, see q_ext_approx_quantile_gauge's discussion
    of sketch trade-offs); min/max/nulls are cheap partials either way.
    Doubles are rendered as Spark's string cast (both engines print
    2dp-exact values identically here)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    aggs = []
    for c in _STATS_COLS:
        aggs += [
            F.countDistinct(c).cast("bigint").alias(f"{c}__ndv"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = li.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__ndv").alias("ndv"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__min").alias("min_val"),
                        F.col(f"{c}__max").alias("max_val"),
                    )
                    for c in _STATS_COLS
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*").orderBy("col")


def _hilbert_step_exprs(i: int, s: int, n: int = 256) -> tuple[str, str, str]:
    """One unrolled Hilbert xy2d step as THREE shared-dialect SQL exprs
    (hx{i},hy{i},hd{i} -> hx{i+1},hy{i+1},hd{i+1}).  The quadrant code
    (3·rx) XOR ry is replaced by the xor-free identity 3·rx + ry − 2·rx·ry
    (equal on {0,1}²), so the identical string runs in Spark and DuckDB.
    Unrolled on purpose: DuckDB's list_reduce evaluates struct-lambda
    folds differently from the loop semantics — chained plain columns are
    bit-identical by construction."""
    rx = f"(CASE WHEN (hx{i} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy{i} & {s}) > 0 THEN 1 ELSE 0 END)"
    hd = f"hd{i} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    hx = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - hy{i} ELSE hy{i} END) "
        f"ELSE hx{i} END"
    )
    hy = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - hx{i} ELSE hx{i} END) "
        f"ELSE hy{i} END"
    )
    return hx, hy, hd


_HILBERT_STEPS = [(i, 1 << (7 - i)) for i in range(8)]  # s = 128 .. 1


def _hilbert_oracle_chain(src_select: str) -> str:
    """Nested derived tables computing hd8 (the Hilbert index) from hx0/hy0."""
    q = src_select
    for i, s in _HILBERT_STEPS:
        hx, hy, hd = _hilbert_step_exprs(i, s)
        q = (
            f"SELECT xk, yk, {hx} AS hx{i + 1}, {hy} AS hy{i + 1}, "
            f"{hd} AS hd{i + 1} FROM ({q}) t{i}"
        )
    return q


@query(
    "q_ext_hilbert_layout",
    oracle=f"""
WITH hil AS (
  SELECT xk, yk, hd8 AS k FROM (
    {_hilbert_oracle_chain(
        "SELECT " + _Z_X + " AS xk, " + _Z_Y + " AS yk, "
        + _Z_X + " AS hx0, " + _Z_Y + " AS hy0, CAST(0 AS BIGINT) AS hd0 "
        "FROM orders")}
  ) hh
), zor AS (
  SELECT {_Z_X} AS xk, {_Z_Y} AS yk,
         CAST({_morton_sql(_Z_X, _Z_Y)} AS BIGINT) AS k
  FROM orders
), lin AS (
  SELECT {_Z_X} AS xk, {_Z_Y} AS yk,
         CAST({_Z_X} * 256 + {_Z_Y} AS BIGINT) AS k
  FROM orders
), cells AS (
  SELECT 'hilbert' AS layout, xk, yk, k FROM (SELECT DISTINCT xk, yk, k FROM hil) a
  UNION ALL
  SELECT 'zorder', xk, yk, k FROM (SELECT DISTINCT xk, yk, k FROM zor) b
  UNION ALL
  SELECT 'rowmajor', xk, yk, k FROM (SELECT DISTINCT xk, yk, k FROM lin) c
), steps AS (
  SELECT layout,
         ABS(xk - LAG(xk) OVER w) + ABS(yk - LAG(yk) OVER w) AS jump
  FROM cells
  WINDOW w AS (PARTITION BY layout ORDER BY k)
)
SELECT layout, CAST(COUNT(jump) AS BIGINT) AS n_steps,
       FLOOR(CAST(SUM(CAST(jump AS DECIMAL(18,6))) AS DOUBLE) / COUNT(jump)
             * 1e6 + 0.5) / 1e6 AS avg_jump,
       CAST(MAX(jump) AS BIGINT) AS max_jump
FROM steps GROUP BY layout ORDER BY layout
""",
    group="E",
)
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E (ext): HILBERT-CURVE clustering vs Z-order vs row-major — the
    data-layout bake-off.  Metric: walk each curve in key order over the
    DISTINCT grid cells present and measure the Manhattan jump between
    consecutive cells — Hilbert's defining property is unit steps (avg =
    max = 1 on a dense grid), Z-order takes power-of-two diagonal leaps
    at tile boundaries, row-major pays a 255-step carriage return per
    row.  (Aligned-bucket bounding boxes — the first metric tried —
    saturate identically for both curves; the jump walk is what actually
    separates them, and it bounds worst-case file spread for range
    predicates.)  The per-layout walk window is bounded by the 2^16 grid,
    never by data volume.

    Mechanics: the xy2d fold is unrolled into 8 chained column steps of
    shared-dialect arithmetic (see _hilbert_step_exprs for why not a
    lambda fold), so the oracle runs the IDENTICAL integer math.  Scale:
    all three indexes are map-side expressions; one aggregation per
    layout over ≤16 buckets."""
    o = load_tables(spark, sf_dir)["orders"]
    hil = o.selectExpr(
        f"{_Z_X} AS xk",
        f"{_Z_Y_SPARK} AS yk",
        f"{_Z_X} AS hx0",
        f"{_Z_Y_SPARK} AS hy0",
        "CAST(0 AS BIGINT) AS hd0",
    )
    for i, s in _HILBERT_STEPS:
        hx, hy, hd = _hilbert_step_exprs(i, s)
        hil = hil.selectExpr(
            "xk", "yk",
            f"{hx} AS hx{i + 1}", f"{hy} AS hy{i + 1}", f"{hd} AS hd{i + 1}",
        )
    hil = hil.selectExpr("xk", "yk", "hd8 AS k").withColumn(
        "layout", F.lit("hilbert")
    )
    zor = o.selectExpr(
        f"{_Z_X} AS xk", f"{_Z_Y_SPARK} AS yk",
        f"CAST({_morton_sql(_Z_X, _Z_Y_SPARK)} AS BIGINT) AS k",
    ).withColumn("layout", F.lit("zorder"))
    lin = o.selectExpr(
        f"{_Z_X} AS xk", f"{_Z_Y_SPARK} AS yk",
        f"CAST({_Z_X} * 256 + {_Z_Y_SPARK} AS BIGINT) AS k",
    ).withColumn("layout", F.lit("rowmajor"))
    allk = (
        hil.distinct().unionByName(zor.distinct()).unionByName(lin.distinct())
    )
    w = Window.partitionBy("layout").orderBy("k")
    steps = allk.select(
        "layout",
        (
            F.abs(F.col("xk") - F.lag("xk").over(w))
            + F.abs(F.col("yk") - F.lag("yk").over(w))
        ).alias("jump"),
    )
    return (
        steps.groupBy("layout")
        .agg(
            F.count("jump").cast("bigint").alias("n_steps"),
            (
                F.floor(
                    F.sum(F.col("jump").cast("decimal(18,6)")).cast("double")
                    / F.count("jump")
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("avg_jump"),
            F.max("jump").cast("bigint").alias("max_jump"),
        )
        .orderBy("layout")
    )


@query(
    "q_ext_cusum_changepoint",
    oracle="""
WITH gm AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu
  FROM events
), dev AS (
  SELECT user_id, ts, event_id,
         CAST(value - gm.mu AS DECIMAL(18,6)) AS d
  FROM events CROSS JOIN gm
), cs AS (
  SELECT user_id,
         ABS(CAST(SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE))
           AS abs_cusum
  FROM dev
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       FLOOR(MAX(abs_cusum) * 1e6 + 0.5) / 1e6 AS max_abs_cusum
FROM cs GROUP BY user_id ORDER BY user_id
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: CUSUM change-point signal — per user, the maximum absolute
    cumulative deviation of event values from the corpus mean.  A mean
    shift in a user's stream makes the cumulative sum drift monotonically,
    so max|CUSUM| is the classic change-point test statistic (Page 1954);
    flat streams hover near zero.

    Float discipline: per-row deviations quantize to DECIMAL before the
    running window sum (order-exact), the global mean comes from the
    decimal path.  Scale: one user_id shuffle; the running frame is
    UNBOUNDED PRECEDING but state is one accumulator per key."""
    e = load_tables(spark, sf_dir)["events"]
    gm = e.agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cs = (
        e.crossJoin(F.broadcast(gm))
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("value") - F.col("mu")).cast("decimal(18,6)").alias("d"),
        )
        .select("user_id", F.abs(F.sum("d").over(w).cast("double")).alias("abs_cusum"))
    )
    return (
        cs.groupBy("user_id")
        .agg(
            bcount().alias("n_events"),
            (F.floor(F.max("abs_cusum") * 1e6 + 0.5) / 1e6).alias("max_abs_cusum"),
        )
        .orderBy("user_id")
    )


@query(
    "q_comp_late_lines_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 75 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    group="B",
)
def late_lines_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the fixture has no l_shipmode/l_commitdate,
    so l_returnflag plays ship mode and "late" means shipped >75 days after
    the order date): fact-fact equi-join with a post-join theta predicate,
    then conditional counts split by order priority.

    100 TB notes: the year filter on l_shipdate is join-independent and
    pushes to the lineitem scan (partition pruning on a shipdate-partitioned
    lake); the lateness predicate references both sides so it evaluates
    post-join, map-side, inside codegen.  Both fact tables shuffle once on
    orderkey; the conditional counts are map-side combined into 3 groups."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_comp_dominant_suppliers",
    oracle=f"""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         {dsum_sql('l_quantity')} AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size < 10
  GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty, COUNT(*) AS n_supp
  FROM shipped GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
FROM shipped sh
JOIN tot t ON sh.l_partkey = t.l_partkey
JOIN supplier s ON s.s_suppkey = sh.l_suppkey
WHERE t.n_supp > 1 AND sh.supp_qty * t.n_supp > 1.5 * t.part_qty
GROUP BY s.s_suppkey, s.s_name
ORDER BY s.s_suppkey
""",
    group="B",
)
def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp in the fixture, so "availqty >
    half the shipped quantity" becomes "this supplier shipped more than
    1.5× its fair share of a contested part's volume" — the fixture's
    10-supplier round-robin never concentrates 50% on one supplier, and a
    vacuous threshold would gut the check): the nested-IN decorrelation —
    a correlated quantity threshold becomes agg → agg → join-back, then a
    dim join to name the suppliers.

    100 TB notes: one (partkey, suppkey) hash agg over the filtered fact
    (map-side combined), the per-part total re-aggregates the ALREADY
    REDUCED table (never a second corpus scan), the join-back is
    reduced-vs-reduced on partkey, and the fair-share compare multiplies
    decimal-exact doubles by the supplier count (no division) so the
    cross-engine float boundary is identical IEEE ops both sides.
    supplier broadcasts."""
    t = load_tables(spark, sf_dir)
    shipped = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_size") < 10)),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("supp_qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    return (
        shipped.join(tot.filter(F.col("n_supp") > 1), "l_partkey")
        .filter(F.col("supp_qty") * F.col("n_supp") > 1.5 * F.col("part_qty"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(bcount().alias("n_dominated_parts"))
        .orderBy("s_suppkey")
    )


@query(
    "q_comp_waiting_orders",
    oracle="""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey,
         COUNT(*) AS n_supp,
         SUM(is_late) AS n_late,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM per_supp GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order po JOIN supplier s ON s.s_suppkey = po.late_supp
WHERE po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
""",
    group="B",
)
def waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped >90 days after order
    date): suppliers who were the SOLE late supplier on a multi-supplier
    finalized order.  The textbook form is EXISTS + NOT-EXISTS self-joins
    on lineitem; at 100 TB two extra corpus-sized joins are the wrong
    plan, so this uses the aggregate decorrelation — per-(order, supplier)
    lateness flags, then per-order counts, then one filter.  Semantically
    identical: "exists another supplier" ⇔ n_supp > 1; "not exists another
    late supplier" ⇔ n_late = 1 (with this supplier late).

    100 TB notes: ONE orderkey shuffle (join) feeds a (orderkey, suppkey)
    hash agg that reuses the same partitioning, the per-order rollup
    re-aggregates the reduced table, and the winner extraction
    (MAX(CASE WHEN late THEN suppkey)) is exact because n_late = 1 rows
    have a unique late supplier — no window needed.  supplier broadcasts;
    the final count is over order-sized (not line-sized) rows."""
    t = load_tables(spark, sf_dir)
    per_supp = (
        t["lineitem"]
        .join(t["orders"].filter(F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(t["supplier"]), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(bcount().alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
    )


def _node_label():
    """Decode the int64 node id (c -> 2k, s -> 2k+1) back to the oracle's
    string label ('c<custkey>' / 's<suppkey>') — only ever applied to the
    final top-20 rows, never to a shuffled column."""
    return F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.shiftright(F.col("node"), 1).cast("string"),
    )


def _pr_oracle(n_iter: int = 3) -> str:
    """Unrolled PageRank oracle: each iteration quantizes per-edge
    contributions at 9dp, decimal-sums them (order-independent), and
    re-quantizes the damped rank at 9dp so both engines carry IDENTICAL
    doubles into the next iteration."""
    parts = [
        """
WITH pairs AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, 1.0 AS r FROM deg
)"""
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""", it{i} AS (
  SELECT e.dst AS node,
         FLOOR((0.15 + 0.85 * CAST(SUM(CAST(FLOOR(r.r / d.d * 1e9 + 0.5) / 1e9
                 AS DECIMAL(18,9))) AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS r
  FROM edges e
  JOIN deg d ON e.src = d.src
  JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst
)"""
        )
        prev = f"it{i}"
    parts.append(
        f"""
SELECT node, FLOOR(r * 1e6 + 0.5) / 1e6 AS rank_score
FROM {prev}
ORDER BY rank_score DESC, node
LIMIT 20"""
    )
    return "".join(parts)


@query("q_ext_pagerank", oracle=_pr_oracle(), group="B")
def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph algorithm as unrolled DataFrame lineage: 3 PageRank
    iterations (damping 0.85) over the bipartite customer↔supplier trade
    graph (distinct order-line pairs, both directions so every node has
    in- and out-edges — no dangling mass).  Top-20 hubs by rank.

    This is the missing ITERATIVE category: each iteration is
    join(ranks, edges on src) → per-dst sum — the textbook distributed PR
    step.  The edge set builds ONCE and persists (3 iterations reuse it);
    ranks are node-sized (≪ edge-sized) every round.

    Determinism across engines AND iterations: per-edge contributions
    quantize at 9dp and the damped rank re-quantizes at 9dp before feeding
    the next round — so both engines iterate on bit-identical doubles and
    round-off can never compound differently (the parity.py recipe applied
    to a fixpoint loop).  Spark-side the quantized contribution
    floor(r/d*1e9+0.5) is summed as BIGINT 1e-9 units (integer addition is
    fully order-independent — strictly stronger than the decimal(18,9) sum
    it replaced, and ~2.7x cheaper on the CPU axis: interleaved A/B at
    sf0.1 measured 79 vs 216 CPU-s medians, identical top-20).  Parity
    with the oracle's decimal sum is exact: SUM(decimal 1e-9 units) cast
    to DOUBLE and (BIGINT unit sum)/1e9 are the same correctly-rounded
    double while the unit sum stays below 2^53 — i.e. per-node inbound
    rank mass below ~9e6, a ceiling even a 100 TB hub graph does not
    approach (rank mass is conserved at ~|V| and hub in-mass tops out
    around rank/0.85).

    At 100 TB: ranks shuffle on src to meet the edge partitioning each
    round — co-partitioning edges and ranks on src (bucketing) makes every
    iteration's join shuffle-free on the big side; power-law hubs are the
    skew case (salt the dst aggregation).  A real deployment caps lineage
    with localCheckpoint every ~10 rounds (the CC op in
    functions/dedup.py:454 shows that pattern); 3 unrolled rounds don't
    need it."""
    t = load_tables(spark, sf_dir)
    # pairs persists (r13 optimization): edges_deg's materialization reads
    # pairs FOUR times (both unionAll branches, for the join side AND the
    # deg side), so without the mark the orders⋈lineitem join + distinct
    # agg — the most expensive subtree in the plan — executed 4x per run.
    # The cache is edge-sized (2 int64s/row), the same class as edges_deg.
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            # int64 node ids (c -> 2k, s -> 2k+1): every shuffle/join below
            # moves 8-byte keys, not strings; labels materialize only in the
            # final (top-20 / per-dist) output
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
        .persist()
    )
    edges = pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst")).unionAll(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )
    # cached once for the per-iteration degree joins and the 3 edge scans;
    # released with the result DF (release_with below) — no
    # session-lifetime cache leak.  r13 optimization round (2nd sitting):
    # the cache is (src, dst) ONLY — the old edges_deg cache carried d on
    # every edge row, but the per-edge contribution floor(r/d*1e9+0.5)
    # depends on src alone, so d now lives in the node-sized deg table and
    # the division+floor run once per NODE per iteration (node-sized
    # ranks⋈deg join, AQE-broadcast into the edge scan) instead of once
    # per EDGE.  Identical unit values summed per dst → bit-identical
    # ranks (oracle MATCH re-proven at 3 SFs).
    # cache CLUSTERED on src (r14 optimization round, guide §2.3/§6.5 —
    # VERDICT r13 item 4): every iteration joins the edge cache on src and
    # the degree agg groups by src, so hash-partitioning the cache once
    # lets all of them reuse the InMemoryRelation's outputPartitioning
    # instead of re-shuffling the edge-sized side per iteration at scale
    # (fixture-scale AQE broadcasts the node side, so the fixture win is
    # the exchange-free deg agg + cache locality).  Paired A/B: sf0.1 wall
    # 0.85x / sf1.0 (data-bound) wall 0.88x CPU 0.88x; weighted twin sf0.1
    # wall 0.83x CPU 0.91x / sf1.0 wall 0.76x CPU 0.77x; top-20 identical
    # (hash placement only — per-dst integer unit sums are order-free).
    edges_c = edges.repartition("src").persist()
    deg = edges_c.groupBy("src").agg(F.count(F.lit(1)).alias("d")).persist()
    q9 = lambda c: F.floor(c * 1e9 + 0.5) / 1e9  # noqa: E731
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(3):
        # floor(double) is LONG in Spark SQL: the 9dp-quantized contribution
        # IS an exact integer count of 1e-9 units — sum the units as BIGINT
        # and divide once (bit-identical to the oracle's decimal sum; see
        # the determinism note in the docstring)
        nodeu = deg.join(ranks, deg["src"] == ranks["node"]).select(
            deg["src"], F.floor(F.col("r") / F.col("d") * 1e9 + 0.5).alias("u")
        )
        contrib = edges_c.join(nodeu, "src").select("dst", "u")
        ranks = contrib.groupBy("dst").agg(
            q9(F.lit(0.15) + F.lit(0.85) * (F.sum("u") / F.lit(1e9))).alias("r")
        ).select(F.col("dst").alias("node"), "r")
    return release_with(
        ranks.select(
            _node_label().alias("node"),
            (F.floor(F.col("r") * 1e6 + 0.5) / 1e6).alias("rank_score"),
        )
        .orderBy(F.col("rank_score").desc(), "node")
        .limit(20),
        edges_c,
        deg,
        pairs,
    )


@query("q_ext_hll_error_gauge", oracle=None)
def hll_error_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext: sketch-accuracy gauge for approx_count_distinct (HyperLogLog++,
    rsd 1%) vs exact COUNT(DISTINCT) over four key columns — the NDV
    companion to q_ext_approx_quantile_gauge.  Rows-only by contract (HLL
    register contents are engine- and layout-specific), but
    tests/test_pipeline_ops.py asserts rel_err < 5·rsd per column.

    At 100 TB the sketch IS the product: exact NDV is a full shuffle of the
    key universe, HLL++ is a fixed 1.5 KB register set merged map-side —
    the one-pass profile every ANALYZE/stats collector runs.  The gauge
    exists so a register-merge regression (or an rsd misconfiguration)
    fails CI with numbers, not vibes."""
    li = load_tables(spark, sf_dir)["lineitem"]
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"]
    aggs = []
    for c in cols:
        aggs.append(F.approx_count_distinct(c, rsd=0.01).alias(f"a_{c}"))
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"e_{c}"))
    row = li.agg(*aggs)
    out = row.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(c) for c in cols]).alias("column"),
                F.array(*[F.col(f"a_{c}").cast("double") for c in cols]).alias("approx_ndv"),
                F.array(*[F.col(f"e_{c}").cast("double") for c in cols]).alias("exact_ndv"),
            )
        ).alias("r")
    ).select(
        F.col("r.column").alias("column"),
        F.col("r.approx_ndv").cast("bigint").alias("approx_ndv"),
        F.col("r.exact_ndv").cast("bigint").alias("exact_ndv"),
        (F.abs(F.col("r.approx_ndv") - F.col("r.exact_ndv")) / F.col("r.exact_ndv")).alias("rel_err"),
    )
    return out.orderBy("column")


@query(
    "q_ext_triangle_count",
    oracle="""
WITH co AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), edges AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM co a JOIN co b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
)
SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
""",
    group="B",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics #2 (with q_ext_pagerank): TRIANGLE COUNTING on the
    co-supplier graph (suppliers sharing an order).  Edges orient
    low-id → high-id, so each triangle {a<b<c} is found exactly once via
    the two-path a→b→c closed by a→c — the standard distributed algorithm.

    At 100 TB the id-orientation generalizes to DEGREE orientation (orient
    toward the higher-degree endpoint): the two-path join fan-out is then
    bounded by sum(min-degree²) instead of sum(degree²), which is what
    keeps power-law graphs (the web, citation graphs) tractable — id
    orientation is the correctness-identical special case for the
    fixture's near-uniform degrees.  Both joins are equi-joins on vertex
    keys (shuffle-partitionable, AQE-skew-splittable); the edge list
    derives from one (orderkey, suppkey) distinct + one self-join per
    order group."""
    li = load_tables(spark, sf_dir)["lineitem"]
    co = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = co.alias("a"), co.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
        .persist()  # read 3x by the self-joins; released with the result DF
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return release_with(
        tri.crossJoin(
            F.broadcast(edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        ).select("n_edges", "n_triangles"),
        edges,
    )


@query(
    "q_ext_skyline",
    oracle="""
WITH pts AS (SELECT DISTINCT p_retailprice AS price, p_size AS sz FROM part)
SELECT price, CAST(sz AS BIGINT) AS sz FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price <= p.price AND q.sz >= p.sz
    AND (q.price < p.price OR q.sz > p.sz)
)
ORDER BY price
""",
    group="B",
)
def skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) over parts: cheapest-price / largest-size
    non-dominated set.  The ORACLE is the textbook quadratic NOT EXISTS;
    the Spark plan is the O(n log n) sorted-cummax form, bucketed into the
    SAME two-stage shape as the q_d4_sequence_pack prefix sums so no
    global window ever sees the point set:

    - sort key (price asc, size desc): any earlier point has price <= mine
      (strictly, except same-price rows which carry strictly larger size),
      so I am dominated IFF the running max of size over earlier rows
      >= my size — one cummax replaces the quadratic dominance probe;
    - stage 1 computes the cummax within floor(price) buckets,
    - stage 2 prefix-maxes the PER-BUCKET maxima (bucket-count rows, tiny)
      and the combined previous-max decides dominance.

    Floor-bucketing preserves the proof: earlier buckets hold strictly
    smaller prices, so their max size dominating mine implies a strictly
    better point.  At 100 TB the bucket key becomes a range-partitioner
    histogram boundary; everything else is map-side + one tiny window —
    this is how skyline/top-k-tradeoff queries (cost vs quality, latency
    vs recall) stay distributed."""
    p = load_tables(spark, sf_dir)["part"]
    pts = p.select(
        F.col("p_retailprice").alias("price"), F.col("p_size").cast("bigint").alias("sz")
    ).distinct()
    pts = pts.withColumn("bucket", F.floor("price"))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("price").asc(), F.col("sz").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = pts.withColumn("cummax_in", F.max("sz").over(w_in))
    bucket_max = staged.groupBy("bucket").agg(F.max("sz").alias("bmax"))
    w_b = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # bucket-count rows only — the stage-2 "tiny global window"
    offs = bucket_max.withColumn("prev_bmax", F.max("bmax").over(w_b)).select(
        "bucket", "prev_bmax"
    )
    return (
        staged.join(offs, "bucket")
        .withColumn(
            "dom_max", F.greatest(F.coalesce("cummax_in", F.lit(-1)), F.coalesce("prev_bmax", F.lit(-1)))
        )
        .filter(F.col("dom_max") < F.col("sz"))
        .select("price", "sz")
        .orderBy("price")
    )


@query(
    "q_ext_bfs_2hop",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2
), edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL SELECT s_node, c_node FROM pairs
), bfs(node, dist) AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR), 0 FROM supplier WHERE s_suppkey <= 2
  UNION ALL
  SELECT e.dst, b.dist + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.dist < 2
), md AS (SELECT node, MIN(dist) AS d FROM bfs GROUP BY node)
SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM md GROUP BY d ORDER BY d
""",
    group="B",
)
def bfs_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family #3: BOUNDED BFS — minimum-distance frontier counts 2
    hops out from a seed set (suppliers 0-2) over the bipartite trade
    graph.  The ORACLE is a WITH RECURSIVE path expansion + MIN(dist)
    rollup; the Spark plan unrolls the two frontier expansions as
    join-per-hop (the Pregel/GraphFrames iteration shape), then takes the
    per-node minimum — identical semantics, because min-dist over an
    unpruned path expansion equals BFS level.

    At 100 TB: frontier expansion is a join of the (small) frontier
    against the (huge, co-partitioned-on-src) edge table — broadcast the
    frontier while it fits, shuffle-join when it doesn't; visited-set
    pruning (anti join per hop) bounds work on high-diameter graphs and
    is deliberately OMITTED here to keep exact oracle parity (at 2 hops
    the expansion is frontier-bounded anyway)."""
    t = load_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            # int64 node ids (c -> 2k, s -> 2k+1): every shuffle/join below
            # moves 8-byte keys, not strings; labels materialize only in the
            # final (top-20 / per-dist) output
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst")))
    edges = edges.persist()  # released with the result DF (release_with)
    seeds = (
        t["supplier"]
        .filter(F.col("s_suppkey") <= 2)
        .select(
            (F.col("s_suppkey") * 2 + 1).alias("node"),
            F.lit(0).alias("dist"),
        )
    )
    frontier = seeds
    reached = seeds
    for hop in (1, 2):
        frontier = (
            edges.join(
                F.broadcast(frontier.select("node").distinct()),
                F.col("src") == F.col("node"),
            )
            .select(F.col("dst").alias("node"), F.lit(hop).alias("dist"))
        )
        reached = reached.unionAll(frontier)
    return release_with(
        reached.groupBy("node")
        .agg(F.min("dist").alias("dist"))
        .groupBy("dist")
        .agg(bcount().alias("n_nodes"))
        .orderBy("dist"),
        edges,
    )


@query(
    "q_ext_triangle_degree_oriented",
    oracle="""
WITH co AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), und AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM co a JOIN co b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
), nodes AS (
  SELECT u AS node FROM und UNION ALL SELECT v FROM und
), deg AS (
  SELECT node, COUNT(*) AS d FROM nodes GROUP BY node
), o AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
)
SELECT CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM o e1
JOIN o e2 ON e2.src = e1.dst
JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
""",
    group="B",
)
def triangle_degree_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): the DEGREE-ORIENTED triangle count — the
    at-scale variant q_ext_triangle_count's docstring promises.  Each
    undirected edge orients toward its higher-(degree, id) endpoint, so
    every node's out-degree is bounded by its effective degeneracy and the
    two-path join fan-out drops from sum(degree²) to sum(min-degree²) —
    THE difference on power-law graphs, where a single celebrity hub
    otherwise generates degree² two-paths.  The triangle total must equal
    the id-oriented count exactly (orientation only changes WHICH copy of
    each triangle is counted); tests assert the two queries agree.

    The (degree, id) pair gives a strict total order — the id tiebreak
    keeps orientation deterministic when degrees tie (every tie rule in
    this repo is explicit for exactly this reason)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    co = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = co.alias("a"), co.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    nodes = und.select(F.col("u").alias("node")).unionAll(
        und.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .persist()  # released with the result DF (release_with)
    )
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return release_with(
        tri.crossJoin(
            F.broadcast(o.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        ).select("n_edges", "n_triangles"),
        o,
    )


def _wpr_oracle(n_iter: int = 3) -> str:
    """Weighted-PageRank oracle: contributions are r(u)·w(u,v)/W(u) with the
    same 9dp-quantize → decimal-sum → 9dp-requantize discipline as
    :func:`_pr_oracle`."""
    parts = [
        """
WITH pw AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT c_node AS src, s_node AS dst, w FROM pw
  UNION ALL
  SELECT s_node AS src, c_node AS dst, w FROM pw
), outw AS (
  SELECT src, SUM(w) AS tw FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, 1.0 AS r FROM outw
)"""
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""", it{i} AS (
  SELECT e.dst AS node,
         FLOOR((0.15 + 0.85 * CAST(SUM(CAST(FLOOR(r.r * e.w / o.tw * 1e9 + 0.5) / 1e9
                 AS DECIMAL(18,9))) AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS r
  FROM edges e
  JOIN outw o ON e.src = o.src
  JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst
)"""
        )
        prev = f"it{i}"
    parts.append(
        f"""
SELECT node, FLOOR(r * 1e6 + 0.5) / 1e6 AS rank_score
FROM {prev}
ORDER BY rank_score DESC, node
LIMIT 20"""
    )
    return "".join(parts)


@query("q_ext_pagerank_weighted", oracle=_wpr_oracle(), group="B")
def pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): WEIGHTED PageRank — random-walk probability
    proportional to trade volume (edge weight = distinct orders linking a
    customer-supplier pair), so a supplier that fills many orders for one
    customer pulls more of that customer's rank than a one-order fling.
    Same unrolled 3-iteration lineage and per-iteration 9dp
    requantization as q_ext_pagerank; the only change is the contribution
    r(u)·w(u,v)/W(u) — weights are exact BIGINTs, and r·w before the
    division keeps the single rounding site identical in both engines.

    At 100 TB: identical shape to the unweighted op (the weight rides the
    edge table for free); weighted walks are the PPR/TrustRank family
    every recommendation graph runs."""
    t = load_tables(spark, sf_dir)
    # pw persists (r13 optimization, same finding as q_ext_pagerank): the
    # weighted-pair agg (orders⋈lineitem + countDistinct) fed SIX
    # evaluations per run without the mark — 2 unionAll branches x (the
    # edges_w join side, the outw side, and the ranks init).
    pw = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            # int64 node ids (c -> 2k, s -> 2k+1) — see q_ext_pagerank
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("w"))
        .persist()
    )
    edges = pw.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
    ).unionAll(pw.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    # NOT re-clustered before caching (r14 optimization round): unlike
    # q_ext_pagerank's union-shaped cache, this cache is the OUTPUT of the
    # edges⋈outw join on src, which Spark already leaves hash-partitioned
    # on src — an explicit repartition("src") here is removed as redundant
    # (verified: before/after formatted plans byte-identical up to plan
    # ids), so the iteration joins already reuse the cached clustering.
    edges_w = edges.join(outw, "src").persist()
    q9 = lambda c: F.floor(c * 1e9 + 0.5) / 1e9  # noqa: E731
    ranks = outw.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(3):
        # BIGINT 1e-9-unit sum of the 9dp-quantized contribution — same
        # exact-parity argument as q_ext_pagerank (the expression inside
        # floor() is unchanged, so the units are provably identical)
        contrib = edges_w.join(ranks, edges_w["src"] == ranks["node"]).select(
            F.col("dst"),
            F.floor(F.col("r") * F.col("w") / F.col("tw") * 1e9 + 0.5).alias("u"),
        )
        ranks = contrib.groupBy("dst").agg(
            q9(F.lit(0.15) + F.lit(0.85) * (F.sum("u") / F.lit(1e9))).alias("r")
        ).select(F.col("dst").alias("node"), "r")
    return release_with(
        ranks.select(
            _node_label().alias("node"),
            (F.floor(F.col("r") * 1e6 + 0.5) / 1e6).alias("rank_score"),
        )
        .orderBy(F.col("rank_score").desc(), "node")
        .limit(20),
        edges_w,
        pw,
    )


def _ppr_oracle(n_iter: int = 3) -> str:
    """Personalized-PageRank oracle: the restart mass 0.15 goes to the SEED
    vector (1/|S| per seed supplier), not uniformly — otherwise identical
    discipline to :func:`_wpr_oracle`."""
    parts = [
        """
WITH pw AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT c_node AS src, s_node AS dst, w FROM pw
  UNION ALL
  SELECT s_node AS src, c_node AS dst, w FROM pw
), outw AS (
  SELECT src, SUM(w) AS tw FROM edges GROUP BY src
), seeds AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node FROM supplier
  WHERE s_suppkey <= 2
), ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM seeds
), r0 AS (
  SELECT o.src AS node,
         CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS r
  FROM outw o LEFT JOIN seeds s ON s.node = o.src CROSS JOIN ns
)"""
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""", it{i} AS (
  SELECT o.src AS node,
         FLOOR((0.15 * (CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END)
                + 0.85 * COALESCE(agg.m, 0.0)) * 1e9 + 0.5) / 1e9 AS r
  FROM outw o
  LEFT JOIN seeds s ON s.node = o.src
  CROSS JOIN ns
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(CAST(FLOOR(r.r * e.w / ow.tw * 1e9 + 0.5) / 1e9
                         AS DECIMAL(18,9))) AS DOUBLE) AS m
    FROM edges e
    JOIN outw ow ON e.src = ow.src
    JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) agg ON agg.node = o.src
)"""
        )
        prev = f"it{i}"
    parts.append(
        f"""
SELECT node, FLOOR(r * 1e6 + 0.5) / 1e6 AS rank_score
FROM {prev}
WHERE r > 0
ORDER BY rank_score DESC, node
LIMIT 20"""
    )
    return "".join(parts)


@query("q_ext_pagerank_personalized", oracle=_ppr_oracle(), group="B")
def pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): PERSONALIZED PageRank — the restart
    distribution concentrates on a seed set (suppliers 0-2) instead of
    spreading uniformly, so the stationary mass measures proximity TO THE
    SEEDS through trade volume: the "similar suppliers / likely next
    customers" primitive behind recommendation random walks (Pixie,
    SALSA-family).  Rank is enumerated over ALL nodes each round (the
    teleport term exists everywhere the walk can restart), not just the
    frontier — nodes the walk hasn't reached hold rank 0 and drop from
    the top-20 report.

    Same per-iteration 9dp requantization as q_ext_pagerank/_weighted;
    the seed indicator joins as a broadcast (3 rows).  At 100 TB, PPR for
    MANY seed sets batches as a (node, seed_set) matrix — the per-seed
    columns share the one edge scan per iteration."""
    t = load_tables(spark, sf_dir)
    # pw + nodes persist (r13 optimization, same finding as q_ext_pagerank):
    # the weighted-pair agg fed the two unionAll branches of edges for BOTH
    # the edges_w join side and the outw side, and the node table (an outw
    # derivation) re-enters the lineage of EVERY iteration's rank frame —
    # without the marks the orders⋈lineitem + countDistinct agg executed
    # ~10x per run.  Both caches are node/edge-sized.
    pw = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            # int64 node ids (c -> 2k, s -> 2k+1) — see q_ext_pagerank
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("w"))
        .persist()
    )
    edges = pw.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
    ).unionAll(pw.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    # NOT re-clustered before caching (r14 optimization round): unlike
    # q_ext_pagerank's union-shaped cache, this cache is the OUTPUT of the
    # edges⋈outw join on src, which Spark already leaves hash-partitioned
    # on src — an explicit repartition("src") here is removed as redundant
    # (verified: before/after formatted plans byte-identical up to plan
    # ids), so the iteration joins already reuse the cached clustering.
    edges_w = edges.join(outw, "src").persist()
    seeds = (
        t["supplier"]
        .filter(F.col("s_suppkey") <= 2)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    n_seeds = seeds.count()  # scalar: 3 (bounded by the filter)
    seed_flag = seeds.withColumn("is_seed", F.lit(True))
    nodes = outw.select(F.col("src").alias("node")).join(
        F.broadcast(seed_flag), "node", "left"
    ).persist()
    restart = F.when(F.col("is_seed"), 1.0 / n_seeds).otherwise(0.0)
    q9 = lambda c: F.floor(c * 1e9 + 0.5) / 1e9  # noqa: E731
    ranks = nodes.select("node", restart.alias("r"))
    for _ in range(3):
        agg = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .select(
                # BIGINT 1e-9-unit sum — same exact-parity argument as
                # q_ext_pagerank (floor() expression unchanged)
                F.col("dst"),
                F.floor(F.col("r") * F.col("w") / F.col("tw") * 1e9 + 0.5).alias("u"),
            )
            .groupBy("dst")
            .agg((F.sum("u") / F.lit(1e9)).alias("m"))
        )
        ranks = (
            nodes.join(agg, nodes["node"] == agg["dst"], "left")
            .select(
                "node",
                q9(
                    F.lit(0.15) * restart
                    + F.lit(0.85) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return release_with(
        ranks.filter(F.col("r") > 0)
        .select(
            _node_label().alias("node"),
            (F.floor(F.col("r") * 1e6 + 0.5) / 1e6).alias("rank_score"),
        )
        .orderBy(F.col("rank_score").desc(), "node")
        .limit(20),
        edges_w,
        pw,
        nodes,
    )


_BFS_ORACLE_SHARED = """
WITH RECURSIVE pairs AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2
), edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL SELECT s_node, c_node FROM pairs
), bfs(node, dist) AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR), 0 FROM supplier WHERE s_suppkey <= 2
  UNION ALL
  SELECT e.dst, b.dist + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.dist < 2
), md AS (SELECT node, MIN(dist) AS d FROM bfs GROUP BY node)
SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM md GROUP BY d ORDER BY d
"""


@query("q_ext_bfs_2hop_pruned", oracle=_BFS_ORACLE_SHARED, group="B")
def bfs_2hop_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): the VISITED-SET-PRUNED BFS — the at-scale twin
    of q_ext_bfs_2hop, sharing its oracle verbatim (the q_a4 salted/
    unsalted proof pattern): each hop anti-joins the new frontier against
    everything already visited, so a node expands AT MOST ONCE.  Equality
    with the unpruned path expansion is exact because BFS level = first
    hop reached = min over all paths — pruning discards only paths that
    could never improve the minimum.

    At 100 TB this anti join is what makes high-diameter / high-fanout
    traversal feasible: the unpruned expansion grows with PATH COUNT
    (exponential in dense graphs), the pruned frontier with NODE COUNT.
    Frontier and visited set both stay node-sized; the anti join is an
    equi-join on the node key (broadcast while the visited set is small,
    shuffle after — AQE decides)."""
    t = load_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            # int64 node ids (c -> 2k, s -> 2k+1): every shuffle/join below
            # moves 8-byte keys, not strings; labels materialize only in the
            # final (top-20 / per-dist) output
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst")))
    edges = edges.persist()  # released with the result DF (release_with)
    frontier = (
        t["supplier"]
        .filter(F.col("s_suppkey") <= 2)
        .select(
            (F.col("s_suppkey") * 2 + 1).alias("node"),
            F.lit(0).alias("dist"),
        )
    )
    visited = frontier
    for hop in (1, 2):
        expanded = (
            edges.join(
                F.broadcast(frontier.select("node")), F.col("src") == F.col("node")
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = expanded.join(
            visited.select("node"), "node", "left_anti"
        ).select("node", F.lit(hop).alias("dist"))
        visited = visited.unionAll(frontier)
    return release_with(
        visited.groupBy("dist")
        .agg(bcount().alias("n_nodes"))
        .orderBy("dist"),
        edges,
    )


def _msppr_oracle(n_iter: int = 3) -> str:
    """Multi-seed PPR oracle: one restart vector PER seed supplier (seed_id
    dimension carried through every CTE), same 9dp-quantize -> decimal-sum
    -> 9dp-requantize discipline as :func:`_ppr_oracle`."""
    parts = [
        """
WITH pw AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT c_node AS src, s_node AS dst, w FROM pw
  UNION ALL
  SELECT s_node AS src, c_node AS dst, w FROM pw
), outw AS (
  SELECT src, SUM(w) AS tw FROM edges GROUP BY src
), seeds AS (
  SELECT CAST(s_suppkey AS BIGINT) AS seed_id,
         's' || CAST(s_suppkey AS VARCHAR) AS seed_node
  FROM supplier WHERE s_suppkey <= 2
), r0 AS (
  SELECT s.seed_id, o.src AS node,
         CASE WHEN o.src = s.seed_node THEN 1.0 ELSE 0.0 END AS r
  FROM outw o CROSS JOIN seeds s
)"""
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""", it{i} AS (
  SELECT s.seed_id, o.src AS node,
         FLOOR((0.15 * (CASE WHEN o.src = s.seed_node THEN 1.0 ELSE 0.0 END)
                + 0.85 * COALESCE(agg.m, 0.0)) * 1e9 + 0.5) / 1e9 AS r
  FROM outw o
  CROSS JOIN seeds s
  LEFT JOIN (
    SELECT r.seed_id, e.dst AS node,
           CAST(SUM(CAST(FLOOR(r.r * e.w / ow.tw * 1e9 + 0.5) / 1e9
                         AS DECIMAL(18,9))) AS DOUBLE) AS m
    FROM edges e
    JOIN outw ow ON e.src = ow.src
    JOIN {prev} r ON r.node = e.src
    GROUP BY r.seed_id, e.dst
  ) agg ON agg.node = o.src AND agg.seed_id = s.seed_id
)"""
        )
        prev = f"it{i}"
    parts.append(
        f""", scored AS (
  SELECT seed_id, node, FLOOR(r * 1e6 + 0.5) / 1e6 AS rank_score
  FROM {prev} WHERE r > 0
), ranked AS (
  SELECT seed_id, node, rank_score,
         ROW_NUMBER() OVER (
           PARTITION BY seed_id ORDER BY rank_score DESC, node) AS rk
  FROM scored
)
SELECT seed_id, CAST(rk AS BIGINT) AS rk, node, rank_score
FROM ranked WHERE rk <= 5
ORDER BY seed_id, rk"""
    )
    return "".join(parts)


@query("q_ext_ppr_multiseed", oracle=_msppr_oracle(), group="B")
def ppr_multiseed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): BATCHED multi-seed Personalized PageRank — one
    restart vector PER seed (suppliers 0-2), all three walks advanced by a
    SINGLE edge scan per iteration.  This is the shape the single-seed
    docstring promised for 100 TB: PPR for many seed sets is a
    (node, seed_id) rank matrix; the per-seed columns ride the same
    edges-join, so K seed sets cost one extra groupBy key, not K edge
    scans.  Real deployments batch thousands of seeds this way (Pixie-style
    recommendation walks); the per-iteration state is |nodes| x |seeds| —
    still node-sized per seed, never edge-sized.

    Same int64 node encoding as q_ext_pagerank (labels decoded only for
    the final top-5-per-seed report) and the same 9dp-per-iteration parity
    discipline, extended with the seed_id grouping key.  Top-5 per seed via
    rank window (count desc tie-broken on the string label, matching the
    oracle's ORDER BY)."""
    t = load_tables(spark, sf_dir)
    # pw + base persist (r13 optimization, same finding as q_ext_pagerank):
    # without the marks the weighted-pair agg executed 4x building edges_w
    # and the (node x seed) base — an outw derivation — re-entered every
    # iteration's rank lineage.  Both caches are node/edge-sized.
    pw = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("w"))
        .persist()
    )
    edges = pw.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
    ).unionAll(pw.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    # NOT re-clustered before caching (r14 optimization round): unlike
    # q_ext_pagerank's union-shaped cache, this cache is the OUTPUT of the
    # edges⋈outw join on src, which Spark already leaves hash-partitioned
    # on src — an explicit repartition("src") here is removed as redundant
    # (verified: before/after formatted plans byte-identical up to plan
    # ids), so the iteration joins already reuse the cached clustering.
    edges_w = edges.join(outw, "src").persist()
    seeds = (
        t["supplier"]
        .filter(F.col("s_suppkey") <= 2)
        .select(
            F.col("s_suppkey").cast("bigint").alias("seed_id"),
            (F.col("s_suppkey") * 2 + 1).alias("seed_node"),
        )
    )
    base = (
        outw.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(seeds))
        .persist()
    )
    q9 = lambda c: F.floor(c * 1e9 + 0.5) / 1e9  # noqa: E731
    ind = F.when(F.col("node") == F.col("seed_node"), F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = base.select("seed_id", "node", ind.alias("r"))
    for _ in range(3):
        contrib = edges_w.join(ranks, edges_w["src"] == ranks["node"]).select(
            # BIGINT 1e-9-unit sum — same exact-parity argument as
            # q_ext_pagerank (floor() expression unchanged)
            F.col("seed_id"),
            F.col("dst"),
            F.floor(F.col("r") * F.col("w") / F.col("tw") * 1e9 + 0.5).alias("u"),
        )
        agg = contrib.groupBy("seed_id", "dst").agg(
            (F.sum("u") / F.lit(1e9)).alias("m")
        ).select(F.col("seed_id").alias("a_seed"), F.col("dst").alias("a_node"), "m")
        ranks = (
            base.join(
                agg,
                (base["node"] == agg["a_node"]) & (base["seed_id"] == agg["a_seed"]),
                "left",
            )
            .select(
                "seed_id",
                "node",
                q9(
                    F.lit(0.15) * ind
                    + F.lit(0.85) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("r"),
            )
            # seed_node must survive for the next round's indicator
            .join(F.broadcast(seeds), "seed_id")
        )
    wnd = Window.partitionBy("seed_id").orderBy(F.col("rank_score").desc(), "node")
    return release_with(
        ranks.filter(F.col("r") > 0)
        .select(
            "seed_id",
            _node_label().alias("node"),
            (F.floor(F.col("r") * 1e6 + 0.5) / 1e6).alias("rank_score"),
        )
        .withColumn("rk", F.row_number().over(wnd).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("seed_id", "rk", "node", "rank_score")
        .orderBy("seed_id", "rk"),
        edges_w,
        pw,
        base,
    )


def _onion_oracle(n_rounds: int = 3) -> str:
    """Onion-decomposition oracle: unrolled peel rounds, all-integer (no
    float anywhere), NOT EXISTS anti-joins for removal — the naive spec
    the two-stage Spark plan must reproduce exactly.  Every CTE is AS
    MATERIALIZED and removal is NOT EXISTS: the round-9 sf0.1 sweep found
    the original NOT IN + plain-CTE form re-inlined each multi-referenced
    CTE, re-evaluating the whole peel chain per reference — exponential in
    rounds (35 s at sf0.01; 79 GB of DuckDB temp spill then an IO error at
    sf0.1).  Same results (node ids are never NULL), evaluated once per
    round like the Spark side."""
    parts = [
        """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), e0 AS MATERIALIZED (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL SELECT s_node, c_node FROM pairs
), n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0)"""
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts.append(
            f""", d{r} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(c.c, 0) AS BIGINT) AS d
  FROM n{p} n LEFT JOIN (SELECT src, COUNT(*) AS c FROM e{p} GROUP BY src) c
    ON c.src = n.node
), m{r} AS MATERIALIZED (SELECT MIN(d) AS min_d FROM d{r}
), rm{r} AS MATERIALIZED (SELECT node FROM d{r}, m{r} WHERE d = min_d
), n{r} AS MATERIALIZED (
  SELECT node FROM n{p}
  WHERE NOT EXISTS (SELECT 1 FROM rm{r} WHERE rm{r}.node = n{p}.node)
), e{r} AS MATERIALIZED (
  SELECT src, dst FROM e{p}
  WHERE NOT EXISTS (SELECT 1 FROM rm{r} WHERE rm{r}.node = e{p}.src)
    AND NOT EXISTS (SELECT 1 FROM rm{r} WHERE rm{r}.node = e{p}.dst)
)"""
        )
    sel = "\nUNION ALL ".join(
        f"""SELECT {r} AS round,
       (SELECT CAST(min_d AS BIGINT) FROM m{r}) AS min_degree,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rm{r}) AS n_removed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM n{r}) AS n_remaining"""
        for r in range(1, n_rounds + 1)
    )
    parts.append(f"\n{sel}\nORDER BY round")
    return "".join(parts)


@query("q_ext_onion_layers", oracle=_onion_oracle(), group="B")
def onion_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): ONION DECOMPOSITION — repeatedly strip the
    current minimum-degree nodes (3 unrolled peel rounds), reporting per
    round the peeled degree, how many nodes fell, and how many remain.
    This is the round-structure of k-core/degeneracy computation
    (Batagelj-Zaversnik): k-core = keep peeling while min-degree < k; the
    onion layers are its per-round trace and the standard graph-shape
    profile (core depth reveals hub structure that degree histograms hide).

    Plan shape per round: degree = one count-agg over the (cached,
    shrinking) edge list; the min is a 1-row agg broadcast back (never a
    partition-less window); removal is two anti-joins (src and dst side).
    Node set is tracked explicitly so isolated nodes (degree 0 after their
    neighbors fell) peel correctly in a later round.  All-integer — no
    float tolerance anywhere.  At 100 TB each round is one agg + two
    hash anti-joins on the shrinking edge set, and real deployments peel
    many degrees per round (bucket peeling) to bound round count; per-round
    caches release with the result (plans.release_with).
    """
    t = load_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    # localCheckpoint (NOT persist) per round: every frame below is referenced
    # by MULTIPLE downstream branches, and without lineage truncation the
    # logical plan tree duplicates each round's subtree per reference —
    # exponential in rounds (the un-truncated version OOM'd the driver just
    # generating the plan STRING).  Checkpointed state is small (node- and
    # edge-sized ints); blocks are ContextCleaner-reclaimed with the result.
    g = pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst")).unionAll(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    ).localCheckpoint(eager=True)
    nodes = g.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    rows = []
    for r in (1, 2, 3):
        # deg/removed stay LAZY: their subtrees are constant-size scans of
        # the checkpointed g/nodes leaves, so the 4 downstream references
        # duplicate only a shallow tree (re-executing a filter over an
        # in-memory scan is cheaper than an extra eager checkpoint job)
        deg = (
            nodes.join(
                g.groupBy("src").agg(F.count(F.lit(1)).alias("c")),
                nodes["node"] == F.col("src"),
                "left",
            )
            .select("node", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("d"))
        )
        mind = deg.agg(F.min("d").alias("min_d"))
        removed = (
            deg.crossJoin(F.broadcast(mind))
            .filter(F.col("d") == F.col("min_d"))
            .select("node")
        )
        new_nodes = nodes.join(removed, "node", "left_anti").localCheckpoint(eager=True)
        new_g = (
            g.join(removed.select(F.col("node").alias("src")), "src", "left_anti")
            .join(removed.select(F.col("node").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        rows.append(
            mind.crossJoin(removed.agg(bcount().alias("n_removed")))
            .crossJoin(new_nodes.agg(bcount().alias("n_remaining")))
            .select(
                F.lit(r).cast("bigint").alias("round"),
                F.col("min_d").cast("bigint").alias("min_degree"),
                "n_removed",
                "n_remaining",
            )
        )
        nodes, g = new_nodes, new_g
    return rows[0].unionAll(rows[1]).unionAll(rows[2]).orderBy("round")


_SIMRANK_ORACLE = """
WITH nbr AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), deg AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM nbr GROUP BY s
), inter AS (
  SELECT a.s AS s_a, b.s AS s_b, CAST(COUNT(*) AS BIGINT) AS common
  FROM nbr a JOIN nbr b ON a.c = b.c AND a.s < b.s
  GROUP BY a.s, b.s
), scored AS (
  SELECT i.s_a, i.s_b, i.common, da.d AS deg_a, db.d AS deg_b,
         FLOOR(0.8 * i.common / (da.d * db.d) * 1e6 + 0.5) / 1e6 AS simrank1
  FROM inter i JOIN deg da ON da.s = i.s_a JOIN deg db ON db.s = i.s_b
)
SELECT s_a, s_b, common, deg_a, deg_b, simrank1
FROM scored
ORDER BY simrank1 DESC, s_a, s_b
LIMIT 20
"""


@query("q_ext_simrank1", oracle=_SIMRANK_ORACLE, group="B")
def simrank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): first-iteration SimRank over supplier pairs —
    s1(a,b) = C · |N(a) ∩ N(b)| / (|N(a)|·|N(b)|) with C = 0.8 and N(s) =
    the supplier's distinct customer neighborhood in the trade graph
    (SimRank's "similar if referenced by similar" recurrence, truncated at
    depth 1 where it reduces to normalized co-citation — Jeh & Widom 2002
    §4.1).  Top-20 most-similar supplier pairs, a recommendation / entity-
    resolution primitive.

    Plan shape: the pairwise state SimRank is infamous for (|V|² scores)
    never materializes — pairs are generated ONLY through the common-
    neighbor equi-join on customer (c = c, a < b for each unordered pair
    once), so the join output is Σ_c deg(c)² wedge rows, aggregated
    map-side into per-pair counts.  At 100 TB: hub customers dominate the
    wedge count — cap or sample mega-degree hubs (the standard SimRank-on-
    MapReduce mitigation) and salt the (s_a, s_b) aggregation; full
    multi-iteration SimRank batches exactly like q_ext_ppr_multiseed
    (scores ride the same edge scan with a pair key).

    Integer-exact inputs (common, degrees are BIGINT counts); the single
    division quantizes at 6dp once, identically in both engines."""
    t = load_tables(spark, sf_dir)
    nbr = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    deg = nbr.groupBy("s").agg(bcount().alias("d"))
    a = nbr.select(F.col("s").alias("s_a"), "c")
    b = nbr.select(F.col("s").alias("s_b"), "c")
    inter = (
        a.join(b, "c")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(bcount().alias("common"))
    )
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("s").alias("s_b"), F.col("d").alias("deg_b"))
    return (
        inter.join(F.broadcast(da), "s_a")
        .join(F.broadcast(db), "s_b")
        .select(
            "s_a",
            "s_b",
            "common",
            "deg_a",
            "deg_b",
            (
                F.floor(
                    F.lit(0.8) * F.col("common") / (F.col("deg_a") * F.col("deg_b"))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("simrank1"),
        )
        .orderBy(F.col("simrank1").desc(), "s_a", "s_b")
        .limit(20)
    )


KCORE_K = 10


def _kcore_oracle(n_rounds: int = 3, k: int = KCORE_K) -> str:
    """Bucketed k-core oracle: each unrolled round peels EVERY node whose
    current degree is below k (not just the minimum layer), the
    Batagelj-Zaversnik bulk step.  All-integer.  CTEs AS MATERIALIZED +
    NOT EXISTS removal, same reason as _onion_oracle: plain CTEs
    re-inline per reference and the peel chain re-evaluates exponentially
    across rounds (48-67 s at sf0.1 before the rewrite)."""
    parts = [
        """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), e0 AS MATERIALIZED (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL SELECT s_node, c_node FROM pairs
), n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0)"""
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts.append(
            f""", d{r} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(c.c, 0) AS BIGINT) AS d
  FROM n{p} n LEFT JOIN (SELECT src, COUNT(*) AS c FROM e{p} GROUP BY src) c
    ON c.src = n.node
), rm{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d < {k}
), n{r} AS MATERIALIZED (
  SELECT node FROM n{p}
  WHERE NOT EXISTS (SELECT 1 FROM rm{r} WHERE rm{r}.node = n{p}.node)
), e{r} AS MATERIALIZED (
  SELECT src, dst FROM e{p}
  WHERE NOT EXISTS (SELECT 1 FROM rm{r} WHERE rm{r}.node = e{p}.src)
    AND NOT EXISTS (SELECT 1 FROM rm{r} WHERE rm{r}.node = e{p}.dst)
)"""
        )
    sel = "\nUNION ALL ".join(
        f"""SELECT {r} AS peel_round,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rm{r}) AS n_removed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM n{r}) AS n_remaining,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges"""
        for r in range(1, n_rounds + 1)
    )
    parts.append(f"\n{sel}\nORDER BY peel_round")
    return "".join(parts)


@query("q_ext_kcore_bucketed", oracle=_kcore_oracle(), group="B")
def kcore_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family (cont.): BUCKETED k-core peeling (k = 10) — each round
    removes EVERY node below the threshold at once (Batagelj-Zaversnik
    bulk step), the production complement to q_ext_onion_layers' one-
    degree-at-a-time trace: bulk rounds converge in O(diameter)-ish
    rounds instead of O(degrees), which is what makes k-core tractable on
    100 TB graphs (each round = one degree agg + two anti-joins, round
    count stays single-digit).  Cascades are the point: stripping round
    1's weak nodes drops neighbors' degrees, so rounds 2-3 peel nodes
    that looked safe before — n_removed may legitimately reach 0 once the
    k-core stabilizes (the fixpoint IS the k-core).

    Same per-round localCheckpoint discipline as onion_layers (multi-
    branch iterative lineage otherwise goes exponential in the plan
    tree); same all-integer output (no float tolerance anywhere)."""
    t = load_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    g = pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst")).unionAll(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    ).localCheckpoint(eager=True)
    nodes = g.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    rows = []
    for r in (1, 2, 3):
        deg = (
            nodes.join(
                g.groupBy("src").agg(F.count(F.lit(1)).alias("c")),
                nodes["node"] == F.col("src"),
                "left",
            )
            .select("node", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("d"))
        )
        removed = deg.filter(F.col("d") < KCORE_K).select("node")
        new_nodes = nodes.join(removed, "node", "left_anti").localCheckpoint(eager=True)
        new_g = (
            g.join(removed.select(F.col("node").alias("src")), "src", "left_anti")
            .join(removed.select(F.col("node").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        rows.append(
            removed.agg(bcount().alias("n_removed"))
            .crossJoin(new_nodes.agg(bcount().alias("n_remaining")))
            .crossJoin(new_g.agg(bcount().alias("n_edges")))
            .select(
                F.lit(r).cast("bigint").alias("peel_round"),
                "n_removed",
                "n_remaining",
                "n_edges",
            )
        )
        nodes, g = new_nodes, new_g
    return rows[0].unionAll(rows[1]).unionAll(rows[2]).orderBy("peel_round")


MAD_K = 3  # robust outlier threshold: |x - median| > MAD_K * MAD


@query(
    "q_ext_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT source, MEDIAN(n_chars) AS med FROM documents GROUP BY source
), dev AS (
  SELECT d.source, d.doc_id, ABS(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m ON m.source = d.source
), mad AS (
  SELECT source, MEDIAN(adev) AS mad FROM dev GROUP BY source
)
SELECT dev.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ANY_VALUE(med.med) AS med_chars,
       ANY_VALUE(mad.mad) AS mad_chars,
       CAST(SUM(CASE WHEN dev.adev > {MAD_K} * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev
JOIN med ON med.source = dev.source
JOIN mad ON mad.source = dev.source
GROUP BY dev.source ORDER BY dev.source
""",
    group="E",
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E: ROBUST OUTLIER DETECTION via median absolute deviation — per
    source, the exact median document length, the MAD around it, and how
    many documents deviate more than {MAD_K}x MAD.  Mean/stddev z-scores
    (q_ext_rolling_zscore) break down when the outliers themselves inflate
    the spread estimate; MAD has a 50% breakdown point, which is why data
    QA monitors (feed-anomaly detection, schema-drift tripwires) run on
    it.

    Determinism: Spark's exact `percentile` and DuckDB's MEDIAN both
    linearly interpolate the middle pair on even counts, over integers and
    integer-difference absolute deviations — every intermediate is an
    exactly-representable x.0/x.5 double, so no rounding discipline is
    even needed.

    Scale shape: exact medians are two sort-based aggs over a NARROW
    (source, n_chars) projection — the heavy text column is pruned at the
    scan.  The two model-sized (per-source) tables broadcast back into
    one counting pass.  At 100 TB you'd swap exact percentile for
    approx_percentile (same plan, sketch-mergeable) once the per-source
    row counts stop fitting a sort."""
    d = load_tables(spark, sf_dir)["documents"].select("source", "doc_id", "n_chars")
    med = d.groupBy("source").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    dev = d.join(F.broadcast(med), "source").select(
        "source", "doc_id", "med", F.abs(F.col("n_chars") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("source").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            bcount().alias("n_docs"),
            F.first("med").alias("med_chars"),
            F.first("mad").alias("mad_chars"),
            F.sum(
                F.when(F.col("adev") > MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("source")
    )


@query(
    "q_ext_benford_audit",
    oracle="""
WITH cents AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
), digits AS (
  SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM cents
), obs AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS t FROM obs
)
SELECT obs.digit, obs.n,
       FLOOR(obs.n / tot.t * 1e6 + 0.5) / 1e6 AS obs_frac,
       FLOOR(LN(1 + 1.0 / obs.digit) / LN(10) * 1e6 + 0.5) / 1e6 AS exp_frac,
       FLOOR((obs.n / tot.t - LN(1 + 1.0 / obs.digit) / LN(10)) * 1e6 + 0.5)
         / 1e6 AS deviation
FROM obs CROSS JOIN tot
ORDER BY obs.digit
""",
    group="E",
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E: BENFORD FIRST-DIGIT AUDIT over extended prices — observed
    leading-significant-digit frequencies vs Benford's log10(1+1/d)
    expectation, with the per-digit deviation.  Fabricated, truncated, or
    unit-mangled monetary feeds break the Benford curve long before
    aggregate totals look wrong, which is why financial data-quality
    monitors run exactly this 9-row report.

    Determinism: prices quantize to exact integer cents via
    floor(x*100 + 0.5) BEFORE digit extraction (a raw double->bigint cast
    TRUNCATES in Spark but ROUNDS in DuckDB — the one cross-engine trap
    here); integer-to-string formatting is unambiguous in both engines;
    the Benford expectation is scalar libm arithmetic quantized at 6dp.

    Scale shape: one projection (digit extraction rides the scan) + one
    9-group hash-agg with map-side partials + a broadcast 1-row total.
    Free at any corpus size."""
    li = load_tables(spark, sf_dir)["lineitem"]
    digits = li.select(
        F.substring(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(bcount().alias("n"))
    tot = obs.agg(F.sum("n").cast("double").alias("t"))
    exp_frac = F.log(1 + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            (F.floor(F.col("n") / F.col("t") * 1e6 + 0.5) / 1e6).alias("obs_frac"),
            (F.floor(exp_frac * 1e6 + 0.5) / 1e6).alias("exp_frac"),
            (
                F.floor((F.col("n") / F.col("t") - exp_frac) * 1e6 + 0.5) / 1e6
            ).alias("deviation"),
        )
        .orderBy("digit")
    )
