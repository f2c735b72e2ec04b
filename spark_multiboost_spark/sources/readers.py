"""Sources (SURVEY.md §2 B1-B2): parquet is the primary scan path (see
operators/relational.q_b01); CSV/JSON readers here round-trip through a temp
dir with explicit DDL schemas — the pattern a production pipeline uses for
schema-pinned ingestion (never inferSchema on 100 TB).

Oracle upgrade (r14, the B28/A12 "stronger than contract" precedent):
byte-level CSV/JSON parity with DuckDB is still not meaningful (dialects,
quoting), but CONTENT parity is — Spark writes doubles with the shortest
round-trippable repr (Java Double.toString / Jackson), so write→parse→agg
must reproduce the source-table aggregate exactly under the decimal-sum
discipline.  Each round-trip's oracle is therefore the same aggregate in
plain SQL over the source table; only the text-source parser (float→string
→double widening is NOT value-preserving against a float→double cast) and
the Python datasource's synthetic input stay rows-only/SQL-special.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import bcount, dsum, dsum_sql
from ..registry import query
from ..session import load_tables

_CSV_SCHEMA = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderpriority STRING"
)

_JSON_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, k BIGINT"
)


@query(
    "q_b02_csv_roundtrip",
    oracle=f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    group="B",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: write orders subset as CSV (header), read back with an explicit
    DDL schema, aggregate. Oracle (r14): content parity with the source —
    the CSV writer's shortest-repr doubles parse back bit-identical."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_csv_"), "orders_csv")
    (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
    back = spark.read.schema(_CSV_SCHEMA).option("header", True).csv(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(bcount().alias("n"), dsum("o_totalprice").alias("sum_price"))
        .orderBy("o_orderstatus")
    )


@query(
    "q_b02_json_roundtrip",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    group="B",
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: write events subset as JSON lines, read back with explicit
    schema (including a field projected out of the props payload).
    Oracle (r14): content parity with the source events table."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_json_"), "events_json")
    (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .write.mode("overwrite")
        .json(path)
    )
    back = spark.read.schema(_JSON_SCHEMA).json(path)
    return (
        back.groupBy("event_type")
        .agg(bcount().alias("n"), dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )


@query(
    "q_b02_orc_roundtrip",
    oracle=f"""
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('s_acctbal')} AS sum_bal
FROM supplier
WHERE s_acctbal > 0
GROUP BY s_nationkey
ORDER BY s_nationkey
""",
    group="B",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: ORC sink + scan — the other columnar warehouse format Spark
    reads natively (predicate pushdown + column pruning apply the same as
    parquet). DuckDB never reads the ORC bytes; the oracle (r14) checks
    the round-trip CONTENT against the source supplier table."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_orc_"), "supplier_orc")
    t["supplier"].write.mode("overwrite").orc(path)
    back = spark.read.orc(path).filter(F.col("s_acctbal") > 0)
    return (
        back.groupBy("s_nationkey")
        .agg(bcount().alias("n"), dsum("s_acctbal").alias("sum_bal"))
        .orderBy("s_nationkey")
    )


@query("q_b01_text_source", oracle=None, group="B")
def text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-adjacent: text-line source -> parse into typed columns, the modern
    analogue of the reference's labeled-point text parser
    ([R] MultiLabeledPointParser, SURVEY §2 A1 — reconstructed citation,
    reference mount empty). Writes `label idx:val ...`-free simple CSV lines
    and parses with split/cast, exercising spark.read.text."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_text_"), "points_text")
    (
        t["embeddings"]
        .select(
            F.concat_ws(
                " ",
                F.col("label").cast("string"),
                F.concat_ws(" ", F.transform("embedding", lambda x: x.cast("string"))),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    lines = spark.read.text(path)
    parsed = lines.select(F.split("value", " ").alias("parts")).select(
        F.element_at("parts", 1).cast("int").alias("label"),
        F.slice("parts", 2, 10_000).alias("raw_feats"),
    ).select("label", F.transform("raw_feats", lambda s: s.cast("double")).alias("features"))
    return parsed.groupBy("label").agg(
        bcount().alias("n"),
        F.round(dsum(F.element_at("features", 1)), 6).alias("sum_f0"),
    ).orderBy("label")


@query(
    "q_b02_schema_evolution",
    oracle="""
SELECT * FROM (
  SELECT 0 AS batch,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(0 AS BIGINT) AS n_scored,
         CAST(COUNT(*) AS BIGINT) AS n_null_score
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 1 AS batch,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_scored,
         CAST(0 AS BIGINT) AS n_null_score
  FROM documents WHERE doc_id % 2 = 1
) ORDER BY batch
""",
    group="B",
)
def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (cont.): parquet schema EVOLUTION — the lake reality that columns
    arrive over time: an early file batch lacks a column a later batch
    has.  ``mergeSchema`` unifies the footers at read time; rows from the
    old files surface NULL for the new column, and downstream aggregates
    must stay NULL-correct.

    At 100 TB: schema merging lists every footer, so production tables
    pin the merged schema in a catalog instead of re-deriving it per read
    — the read-side semantics exercised here (late columns NULL-fill) are
    identical either way.  Returns per-batch row counts and
    new-column coverage, read back from the unified view."""
    d = load_tables(spark, sf_dir)["documents"]
    root = tempfile.mkdtemp(prefix="smb_evolve_")
    # batch 0: early files, no quality_score column
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "text").withColumn(
        "batch", F.lit(0)
    ).write.mode("overwrite").parquet(os.path.join(root, "b0"))
    # batch 1: later files gained quality_score
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "text").withColumn(
        "batch", F.lit(1)
    ).withColumn(
        "quality_score", (F.col("doc_id") % 100).cast("double") / 100
    ).write.mode("overwrite").parquet(os.path.join(root, "b1"))
    unified = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "b0"), os.path.join(root, "b1")
    )
    return (
        unified.groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("quality_score").cast("bigint").alias("n_scored"),
            F.sum(F.col("quality_score").isNull().cast("int"))
            .cast("bigint")
            .alias("n_null_score"),
        )
        .orderBy("batch")
    )


_PYDS_ROWS_PER_PART = 500
_PYDS_PARTS = 8


@query(
    "q_b02_python_datasource",
    oracle=f"""
WITH gen AS (
  SELECT p.part_id, r.range AS row_id,
         p.part_id * {_PYDS_ROWS_PER_PART} + r.range AS uid,
         (p.part_id * {_PYDS_ROWS_PER_PART} + r.range) % 7 AS bucket
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {_PYDS_PARTS - 1})) AS part_id) p,
       RANGE({_PYDS_ROWS_PER_PART}) r
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(uid) AS BIGINT) AS sum_uid
FROM gen GROUP BY bucket ORDER BY bucket
""",
    group="B",
)
def python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (cont.): a CUSTOM PYTHON DATA SOURCE (Spark 4's DataSource API) —
    the extension point for reading systems Spark has no built-in connector
    for.  The source declares {_PYDS_PARTS} input partitions, each worker
    generates its own deterministic slice (no driver materialization), and
    the result is hash-verified against a DuckDB generator producing the
    same rows — proving the partitioned read path delivers exactly the
    declared data.

    Scale shape: partitions() is how a custom source exposes parallelism —
    each partition reads independently on an executor (here a formula; in
    production an API page, a Kafka split, a shard).  The aggregate on top
    is a normal one-shuffle rollup."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    rows_per_part = _PYDS_ROWS_PER_PART

    class _GenReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(_PYDS_PARTS)]

        def read(self, partition):
            pid = partition.value
            for r in range(rows_per_part):
                uid = pid * rows_per_part + r
                yield (pid, r, uid, uid % 7)

    class _GenSource(DataSource):
        @classmethod
        def name(cls):
            return "smb_gen"

        def schema(self):
            return "part_id int, row_id int, uid bigint, bucket bigint"

        def reader(self, schema):
            return _GenReader()

    spark.dataSource.register(_GenSource)
    df = spark.read.format("smb_gen").load()
    return (
        df.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(bcount().alias("n"), F.sum("uid").cast("bigint").alias("sum_uid"))
        .orderBy("bucket")
    )
