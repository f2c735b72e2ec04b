"""Sinks (SURVEY.md §2 B3): partitioned parquet write + read-back.

Scale notes: `partitionBy` on a low-cardinality natural key gives partition
pruning to every downstream reader; the read-back query here filters one
partition and the scan shows PartitionFilters (dynamic pruning territory at
cluster scale).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import bcount, dsum, dsum_sql
from ..registry import query
from ..session import load_tables

# Round-14 oracle upgrades (stronger than SURVEY §2's rows-only contract,
# the B28/A12 precedent): a lossless sink's read-back aggregate must equal
# the SAME aggregate computed directly on the source table, so the oracle
# is plain SQL over the source — a dropped row, a partition lost in the
# rewrite, or a value mangled by the sink breaks the value hash.  Layout
# reports (compaction file counts, zone-map stats) stay rows-only: their
# output is engine-specific by nature.


@query(
    "q_b03_partitioned_write",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_linestatus
""",
    group="B",
)
def partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: write lineitem partitioned by l_returnflag, read back with a
    partition filter, aggregate.  Oracle (r14 upgrade): the read-back
    content must equal the source-table aggregate — sink correctness as a
    value-hash, not just a row count."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_pq_"), "lineitem_part")
    (
        t["lineitem"]
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        bcount().alias("n"), dsum("l_quantity").alias("sum_qty")
    ).orderBy("l_linestatus")


def _source_token(sf_dir: str) -> str:
    """Cheap content fingerprint of the join inputs: (name, size, mtime_ns)
    of every file under the lineitem/orders parquet dirs, hashed.  Keys the
    bucketed-table names so catalog reuse is provably same-data (ADVICE
    r12: a long-lived session whose catalog retained li_bkt_/o_bkt_ tables
    written from DIFFERENT data under the same sf_dir tag would otherwise
    reuse them, and q_b03's exact oracle over the fresh source would report
    a MISMATCH that looks like an engine bug — fail-safe but confusing)."""
    import hashlib

    h = hashlib.sha256()
    for tbl in ("lineitem", "orders"):
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        paths = sorted(os.listdir(p)) if os.path.isdir(p) else [p]
        for name in paths:
            fp = os.path.join(p, name) if os.path.isdir(p) else p
            st = os.stat(fp)
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:12]


def bucketed_join_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem + orders as bucketed tables sharing the join key layout
    (8 buckets on the orderkey), registering them in the session catalog.
    Idempotent per (session, source-content token): the table names embed a
    file-listing fingerprint of the source parquet, so a stale catalog entry
    from different data can never be silently reused (ADVICE r12)."""
    tag = (
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
        + "_"
        + _source_token(sf_dir)
    )
    li_name, o_name = f"li_bkt_{tag}", f"o_bkt_{tag}"
    if not spark.catalog.tableExists(li_name):
        t = load_tables(spark, sf_dir)
        base = tempfile.mkdtemp(prefix="smb_bkt_")
        (
            t["lineitem"]
            .write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, li_name))
            .saveAsTable(li_name)
        )
        (
            t["orders"]
            .write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, o_name))
            .saveAsTable(o_name)
        )
    return li_name, o_name


@query(
    "q_b03_bucketed_join",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    group="B",
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B5 scale pattern: co-located join via bucketing. Both sides are
    bucketed 8-ways on the join key, so the sort-merge join reads matching
    buckets directly — NO shuffle exchange on either side (asserted in
    tests/test_plans.py). At 100 TB this is the difference between joining
    in place and moving both tables over the network; the same layout is
    reusable by every downstream orderkey join.  Oracle (r14 upgrade): the
    bucketed tables' join-agg must equal the plain source join-agg — the
    bucketing layout is an optimization, never a semantic change."""
    li_name, o_name = bucketed_join_tables(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(bcount().alias("n_items"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_b03_range_sorted_write",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
    group="B",
)
def range_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (cont.): range-partitioned, within-file-sorted layout — each
    output file covers a disjoint l_shipdate range with sorted row groups,
    so a time-range reader prunes whole files on parquet min/max stats
    (the clustering/Z-order-lite every time-series warehouse wants). The
    read-back filters one narrow month; oracle (r14 upgrade): that month's
    agg straight off the source table.  (The repartitionByRange boundaries
    are per-run sampled — fine here because the ORACLE checks content, not
    layout; the layout-feeds-a-check ban from NEXT.md does not apply.)"""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_rng_"), "lineitem_ranged")
    (
        t["lineitem"]
        .repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return back.agg(
        bcount().alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query("q_b03_compaction", oracle=None, group="B")
def compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (cont.): small-file compaction — the standing maintenance job of
    any 100 TB lake.  Streaming ingests and over-parallel writers leave
    partitions fragmented into thousands of KB-sized files; NameNode/
    listing pressure and per-file open cost then dominate read time.

    This op (1) writes ``documents`` partitioned by ``lang`` with an
    artificially fragmented layout (every task writes into every
    partition), (2) audits the lake via ``input_file_name()`` — a pure
    read-side aggregation, no filesystem walk — and (3) compacts by
    rewriting each partition from a single shuffle
    (``repartition("lang")``), with ``maxRecordsPerFile`` as the file-size
    governor so oversized partitions still split.  Returns the per-lang
    before/after file counts (rows-only: sink correctness = read-back).

    At cluster scale the same three steps run partition-targeted (only
    fragmented partitions rewrite — the audit tells you which), and the
    rewrite inherits B3's sorted/bucketed layout options."""
    d = load_tables(spark, sf_dir)["documents"]
    root = tempfile.mkdtemp(prefix="smb_compact_")
    frag, tidy = os.path.join(root, "frag"), os.path.join(root, "tidy")
    # fragmented ingest: 8 writer tasks x |lang| partitions
    d.repartition(8).write.mode("overwrite").partitionBy("lang").parquet(frag)

    def audit(path: str, label: str) -> DataFrame:
        return (
            spark.read.parquet(path)
            .select("lang", F.input_file_name().alias("f"))
            .groupBy("lang")
            .agg(F.count_distinct("f").cast("bigint").alias(f"files_{label}"))
        )

    before = audit(frag, "before")
    (
        spark.read.parquet(frag)
        .repartition("lang")  # one shuffle, co-locates each partition
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)  # size governor, not a cap
        .partitionBy("lang")
        .parquet(tidy)
    )
    after = audit(tidy, "after")
    return (
        before.join(after, "lang")
        .select("lang", "files_before", "files_after")
        .orderBy("lang")
    )


@query(
    "q_b03_dynamic_partition_overwrite",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_discount END
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_discount
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    group="B",
)
def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (cont.): DYNAMIC partition overwrite — the lakehouse backfill
    primitive.  Static overwrite mode would truncate the whole table;
    dynamic mode replaces ONLY the partitions present in the incoming
    write.  Here: land lineitem partitioned by l_returnflag, rewrite JUST
    the 'R' partition with a corrected discount, and report per-partition
    row counts + discount sums proving the other partitions' bytes were
    never touched (their sums are unchanged) while 'R' reflects the fix.

    At 100 TB this is THE idempotent-backfill shape: re-running a day's
    job rewrites that day's partition atomically and leaves the other
    ~36,500 partitions alone."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_dyn_"), "lineitem_lake")
    li = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_discount", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    fixed = (
        li.filter(F.col("l_returnflag") == "R")
        .withColumn("l_discount", F.lit(0.0))
    )
    (
        fixed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("l_returnflag")
        .agg(bcount().alias("n"), dsum("l_discount").alias("sum_discount"))
        .orderBy("l_returnflag")
    )


@query("q_b01_zonemap_skip", oracle=None, group="B")
def zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 (cont.): ZONE-MAP (file-stats) SKIPPING report — the data-layout
    audit behind partition/file pruning.  Lineitem is written bucketed by
    VALUE on the time key (date_trunc('quarter') — an Iceberg-style
    partition transform, one file per quarter); this job reads the files
    back, computes each file's (min, max) of the key via
    input_file_name(), and reports how many files a typical time-slice
    predicate can skip WITHOUT reading them.  On a lake this is exactly
    what the parquet footer stats / Iceberg manifest give the planner —
    the report quantifies whether the layout actually clusters the key.

    Value-based buckets, NOT repartitionByRange: range boundaries come
    from reservoir sampling with a per-run seed, so the file layout (and
    with it this audit's counts) was nondeterministic run-to-run — the
    round-7 stability sweep caught exactly that.  date_trunc buckets are
    pure map-side expressions, deterministic at any scale, and what real
    partition transforms use.

    Scale: one pass to build the per-file stats (tiny table: one row per
    file), the skip accounting is arithmetic over it."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_zone_"), "li_ranged")
    (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_shipdate",
            "l_extendedprice",
            F.date_trunc("quarter", "l_shipdate").alias("q"),
        )
        # hash-repartition ON the bucket value: every row of a quarter lands
        # in one task, so partitionBy writes exactly one file per quarter
        .repartition(F.col("q"))
        .write.mode("overwrite")
        .partitionBy("q")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    stats = (
        back.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    return stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(
            F.when((F.col("max_ship") < lo) | (F.col("min_ship") >= hi), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_skippable"),
        F.sum(
            F.when(
                (F.col("max_ship") < lo) | (F.col("min_ship") >= hi),
                F.col("n_rows"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rows_skipped"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
    )
